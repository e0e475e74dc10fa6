from .pagerank import pagerank  # noqa: F401
from .hits import hits  # noqa: F401
from .eigenvector import eigenvector_centrality  # noqa: F401
from .kcore import core_number, k_core  # noqa: F401
from .sssp import shortest_path_lengths  # noqa: F401
from .linkpred import link_prediction  # noqa: F401
from .betweenness import betweenness_centrality  # noqa: F401
