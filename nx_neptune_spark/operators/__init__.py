from .pagerank import pagerank  # noqa: F401
from .hits import hits  # noqa: F401
from .eigenvector import eigenvector_centrality  # noqa: F401
from .kcore import core_number, k_core  # noqa: F401
from .sssp import shortest_path_lengths  # noqa: F401
from .linkpred import link_prediction  # noqa: F401
from .betweenness import betweenness_centrality  # noqa: F401
from .ktruss import k_truss  # noqa: F401
from .modularity import modularity, modularity_stats  # noqa: F401
from .clustering import (  # noqa: F401
    average_clustering,
    clustering,
    transitivity,
)
from .reciprocity import overall_reciprocity, reciprocity  # noqa: F401
from .harmonic import harmonic_centrality  # noqa: F401
from .scc import strongly_connected_components  # noqa: F401
from .condensation import condensation  # noqa: F401
from .assortativity import degree_assortativity_coefficient  # noqa: F401
from .toposort import topological_generations  # noqa: F401
from .setops import (  # noqa: F401
    compose,
    difference,
    intersection,
    symmetric_difference,
)
from .dagpath import (  # noqa: F401
    dag_longest_path,
    dag_longest_path_length,
    dag_longest_path_table,
)
from .katz import katz_centrality  # noqa: F401
from .structure import (  # noqa: F401
    effective_size,
    global_efficiency,
    isolates,
    number_of_isolates,
    rich_club_coefficient,
    s_metric,
)
from .bipartite import bipartite_color, is_bipartite  # noqa: F401
from .triads import triadic_census  # noqa: F401
from .voterank import voterank  # noqa: F401
from .squares import square_clustering  # noqa: F401
from .quality import partition_quality  # noqa: F401
from .laplacian import laplacian_centrality  # noqa: F401
from .nodeclass import (  # noqa: F401
    harmonic_function,
    local_and_global_consistency,
)
from .trophic import (  # noqa: F401
    trophic_differences,
    trophic_incoherence_parameter,
    trophic_levels,
)
from .trees import (  # noqa: F401
    is_arborescence,
    is_branching,
    is_forest,
    is_tree,
)
from .holes import constraint, local_constraints  # noqa: F401
from .cuts import (  # noqa: F401
    boundary_expansion,
    conductance,
    cut_size,
    edge_boundary,
    edge_expansion,
    mixing_expansion,
    node_boundary,
    node_expansion,
    normalized_cut_size,
    volume,
)
from .distance import (  # noqa: F401
    barycenter,
    center,
    diameter,
    eccentricity,
    periphery,
    radius,
    wiener_index,
)
from .msf import (  # noqa: F401
    minimum_spanning_edges,
    minimum_spanning_forest_weight,
)
from .anf import (  # noqa: F401
    effective_diameter,
    neighborhood_function,
)
from .walks import (  # noqa: F401
    node2vec_walks,
    random_walks,
    walk_sentences,
)
from .bridges import (  # noqa: F401
    bridges,
    bridges_and_components,
    has_bridges,
    local_bridges,
    two_edge_components,
)
from .onion import onion_layers  # noqa: F401
from .percolation import percolation_centrality  # noqa: F401
from .simrank import simrank_similarity  # noqa: F401
from .load import load_centrality  # noqa: F401
from .closure import transitive_closure, transitive_reduction  # noqa: F401
from .dispersion import dispersion  # noqa: F401
