"""NetworkX backend dispatch: ``nx.pagerank(G, backend="spark")``.

Parity with the reference's plugin entry point
(/root/reference/nx_neptune/interface.py:45-85 ``assign_algorithms`` +
``BackendInterface``; registered via the ``networkx.backends`` /
``networkx.backend_info`` entry points in
/root/reference/pyproject.toml:38-42). A pip install of this repo
registers the ``spark`` backend through the identical entry points in
our pyproject.toml; :func:`register` performs the same registration at
runtime for environments where the package is used from a source
checkout (this sandbox), by installing an entry-point shim into
``networkx.utils.backends`` -- the documented discovery dict -- and
rebinding ``_dispatchable.__call__`` to the any-backends-installed
variant (NetworkX freezes that choice at import time purely as a fast
path for the zero-backends case).

Dispatch semantics mirror the reference: ``convert_from_nx`` /
``convert_to_nx`` are passthroughs (interface.py:76-85) and each
algorithm wrapper builds the Spark-resident graph itself. Node keys in
results are the caller's original node objects (NetworkX contract),
mapped back from the engine's string vertex names.
"""

from __future__ import annotations

import warnings
from typing import Any, Iterable

from . import api
from .graph import LinkGraph

# Algorithms the reference dispatches (interface.py:45-58) plus the two
# north-rule additions this engine implements natively.
ALGORITHMS = [
    "bfs_edges",
    "bfs_layers",
    "descendants_at_distance",
    "descendants",
    "ancestors",
    "pagerank",
    "degree_centrality",
    "in_degree_centrality",
    "out_degree_centrality",
    "closeness_centrality",
    "label_propagation_communities",
    "asyn_lpa_communities",
    "fast_label_propagation_communities",
    "louvain_communities",
    "modularity",
    # north-rule additions (SURVEY.md §2.9)
    "connected_components",
    "strongly_connected_components",
    "number_strongly_connected_components",
    "condensation",
    "degree_assortativity_coefficient",
    "degree_pearson_correlation_coefficient",
    "average_degree_connectivity",
    "average_neighbor_degree",
    "s_metric",
    "triadic_census",
    "voterank",
    "eccentricity",
    "diameter",
    "radius",
    "center",
    "periphery",
    "barycenter",
    "wiener_index",
    "average_shortest_path_length",
    "local_reaching_centrality",
    "global_reaching_centrality",
    "cut_size",
    "volume",
    "conductance",
    "normalized_cut_size",
    "edge_expansion",
    "mixing_expansion",
    "node_expansion",
    "boundary_expansion",
    "node_boundary",
    "edge_boundary",
    "partition_quality",
    "constraint",
    "local_constraint",
    "laplacian_centrality",
    "harmonic_function",
    "local_and_global_consistency",
    "trophic_levels",
    "trophic_differences",
    "trophic_incoherence_parameter",
    "is_tree",
    "is_forest",
    "is_branching",
    "is_arborescence",
    "global_efficiency",
    "rich_club_coefficient",
    "effective_size",
    "isolates",
    "number_of_isolates",
    "is_bipartite",
    "color",
    "weakly_connected_components",
    "number_connected_components",
    "number_weakly_connected_components",
    "is_connected",
    "is_weakly_connected",
    "is_strongly_connected",
    "attracting_components",
    "number_attracting_components",
    "topological_generations",
    "topological_sort",
    "katz_centrality",
    "triangles",
    "hits",
    # round-4 link-graph extensions
    "betweenness_centrality",
    "edge_betweenness_centrality",
    "eigenvector_centrality",
    "core_number",
    "k_core",
    "k_shell",
    "k_crust",
    "k_corona",
    "k_truss",
    "single_source_dijkstra_path_length",
    "jaccard_coefficient",
    "adamic_adar_index",
    "resource_allocation_index",
    "preferential_attachment",
    "cn_soundarajan_hopcroft",
    "ra_index_soundarajan_hopcroft",
    "within_inter_cluster",
    "common_neighbor_centrality",
    # round-5 link-graph extensions
    "clustering",
    "transitivity",
    "average_clustering",
    "square_clustering",
    "reciprocity",
    "overall_reciprocity",
    "harmonic_centrality",
    "maximal_independent_set",
    "greedy_color",
    "maximal_matching",
    "min_weighted_vertex_cover",
    "dominating_set",
    "minimum_spanning_edges",
    "maximum_spanning_edges",
    "minimum_spanning_tree",
    "maximum_spanning_tree",
    "is_directed_acyclic_graph",
    "dag_longest_path",
    "dag_longest_path_length",
    "has_path",
    "single_source_shortest_path_length",
    "compose",
    "intersection",
    "difference",
    "symmetric_difference",
    "bridges",
    "has_bridges",
    "local_bridges",
    "k_edge_components",
    "onion_layers",
    "percolation_centrality",
    "projected_graph",
    "weighted_projected_graph",
    "overlap_weighted_projected_graph",
    "collaboration_weighted_projected_graph",
    "simrank_similarity",
    "load_centrality",
    "newman_betweenness_centrality",
    "attribute_assortativity_coefficient",
    "numeric_assortativity_coefficient",
    "is_eulerian",
    "is_semieulerian",
    "has_eulerian_path",
    "transitive_closure",
    "transitive_closure_dag",
    "transitive_reduction",
    "dispersion",
    "girvan_newman",
    "efficiency",
    "generalized_degree",
]


def _spark():
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError(
            "backend='spark' needs an active SparkSession "
            "(create one with nx_neptune_spark.session.get_spark())"
        )
    return s


def _lg(G) -> LinkGraph:
    return LinkGraph.from_networkx(_spark(), G)


def _back(G) -> dict[str, Any]:
    """str(vertex name) -> original node object."""
    return {str(n): n for n in G.nodes()}


def _weighted_lg(G, weight: str, ignore_nan: bool) -> LinkGraph:
    """LinkGraph honoring a CUSTOM weight data key + nx's NaN contract
    (spanning-tree family: ValueError on NaN unless ignore_nan, which
    instead drops the edge). ``_lg``/``from_networkx`` only read the
    canonical "weight" key, so the spanning-tree dispatches build their
    triples here."""
    import math

    import networkx as nx

    pairs = []
    for u, v, d in G.edges(data=True):
        w = d.get(weight, 1)
        if isinstance(w, float) and math.isnan(w):
            if ignore_nan:
                continue
            raise ValueError(
                f"NaN found as an edge weight. Edge ({u}, {v}, {d})"
            )
        pairs.append((str(u), str(v), float(w)))
    return LinkGraph.from_edge_pairs(
        _spark(), pairs, nodes=[str(n) for n in G.nodes()],
        directed=G.is_directed(),
    )


class BackendInterface:
    """NetworkX backend: every attribute named like a dispatchable
    function is callable with that function's full signature."""

    @staticmethod
    def convert_from_nx(graph, *args, **kwargs):
        return graph

    @staticmethod
    def convert_to_nx(obj, *args, **kwargs):
        return obj

    # -- link analysis -------------------------------------------------

    @staticmethod
    def pagerank(
        G,
        alpha=0.85,
        personalization=None,
        max_iter=100,
        tol=1.0e-6,
        nstart=None,
        weight="weight",
        dangling=None,
        **backend_kwargs,
    ):
        back = _back(G)
        res = api.pagerank(
            _lg(G),
            alpha=alpha,
            personalization=personalization,
            max_iter=max_iter,
            tol=tol,
            nstart=nstart,
            weight=weight,
            dangling=dangling,
            **backend_kwargs,
        )
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def hits(G, max_iter=100, tol=1e-8, nstart=None, normalized=True, **kw):
        back = _back(G)
        h, a = api.hits(
            _lg(G),
            max_iter=max_iter,
            tol=tol,
            nstart=nstart,
            normalized=normalized,
            **kw,
        )
        return (
            {back[k]: v for k, v in h.items()},
            {back[k]: v for k, v in a.items()},
        )

    # -- centrality ----------------------------------------------------

    @staticmethod
    def degree_centrality(G, **kw):
        back = _back(G)
        return {back[k]: v for k, v in api.degree_centrality(_lg(G), **kw).items()}

    @staticmethod
    def in_degree_centrality(G, **kw):
        back = _back(G)
        return {back[k]: v for k, v in api.in_degree_centrality(_lg(G), **kw).items()}

    @staticmethod
    def out_degree_centrality(G, **kw):
        back = _back(G)
        return {back[k]: v for k, v in api.out_degree_centrality(_lg(G), **kw).items()}

    @staticmethod
    def closeness_centrality(G, u=None, distance=None, wf_improved=True, **kw):
        if distance is not None:
            # weighted form: a SUPERSET of the reference (which
            # warns-and-ignores `distance`), served by the batched
            # multi-source relaxation in operators/closeness.py
            res = api.weighted_closeness(
                _weighted_lg(G, distance, False), u=u, wf_improved=wf_improved
            )
        else:
            res = api.closeness_centrality(
                _lg(G), u=u, distance=None, wf_improved=wf_improved, **kw
            )
        if u is not None:
            return res
        back = _back(G)
        return {back[k]: v for k, v in res.items()}

    # -- communities ---------------------------------------------------

    @staticmethod
    def label_propagation_communities(G, **kw):
        back = _back(G)
        return [
            {back[m] for m in c}
            for c in api.label_propagation_communities(_lg(G), **kw)
        ]

    @staticmethod
    def asyn_lpa_communities(G, weight=None, seed=None, **kw):
        back = _back(G)
        comms = api.asyn_lpa_communities(_lg(G), weight=weight, seed=seed, **kw)
        return iter([{back[m] for m in c} for c in comms])

    @staticmethod
    def fast_label_propagation_communities(G, *, weight=None, seed=None, **kw):
        back = _back(G)
        comms = api.fast_label_propagation_communities(
            _lg(G), weight=weight, seed=seed, **kw
        )
        return iter([{back[m] for m in c} for c in comms])

    @staticmethod
    def louvain_communities(
        G,
        weight="weight",
        resolution=1,
        threshold=1e-07,
        max_level=None,
        seed=None,
        **kw,
    ):
        back = _back(G)
        comms = api.louvain_communities(
            _lg(G),
            weight=weight,
            resolution=resolution,
            threshold=threshold,
            max_level=max_level,
            seed=seed,
            **kw,
        )
        return [{back[m] for m in c} for c in comms]

    @staticmethod
    def modularity(G, communities, weight="weight", resolution=1, **kw):
        # mirror nx.community.modularity's partition validation with
        # its own exception class before dispatching the distributed
        # scorer
        import networkx as nx

        comms = [set(c) for c in communities]
        nodes = set(G.nodes)
        covered: set = set()
        total = 0
        for c in comms:
            covered |= c
            total += len(c)
        if covered != nodes or total != len(nodes):
            raise nx.algorithms.community.quality.NotAPartition(G, comms)
        return api.modularity(
            _lg(G), comms, weight=weight, resolution=resolution, **kw
        )

    # -- traversal -----------------------------------------------------

    @staticmethod
    def bfs_edges(G, source, reverse=False, depth_limit=None, sort_neighbors=None, **kw):
        if sort_neighbors is not None:
            # reference pattern: explicit warn-and-ignore
            warnings.warn(
                "Parameter `sort_neighbors` is not supported by bfs_edges "
                "and will be ignored.",
                stacklevel=3,
            )
        back = _back(G)
        for a, b in api.bfs_edges(
            _lg(G), source, reverse=reverse, depth_limit=depth_limit, **kw
        ):
            yield (back[a], back[b])

    @staticmethod
    def bfs_layers(G, sources, **kw):
        back = _back(G)
        for layer in api.bfs_layers(_lg(G), sources, **kw):
            yield [back[m] for m in layer]

    @staticmethod
    def descendants(G, source, **kw):
        import networkx as nx

        back = _back(G)
        try:
            return {back[m] for m in api.descendants(_lg(G), source, **kw)}
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e

    @staticmethod
    def ancestors(G, source, **kw):
        import networkx as nx

        back = _back(G)
        try:
            return {back[m] for m in api.ancestors(_lg(G), source, **kw)}
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e

    @staticmethod
    def descendants_at_distance(G, source, distance, **kw):
        back = _back(G)
        return {back[m] for m in api.descendants_at_distance(_lg(G), source, distance, **kw)}

    # -- north-rule additions -------------------------------------------

    @staticmethod
    def connected_components(G, **kw):
        back = _back(G)
        return iter([{back[m] for m in c} for c in api.connected_components(_lg(G), **kw)])

    @staticmethod
    def strongly_connected_components(G, **kw):
        back = _back(G)
        return iter(
            [
                {back[m] for m in c}
                for c in api.strongly_connected_components(_lg(G), **kw)
            ]
        )

    @staticmethod
    def number_strongly_connected_components(G, **kw):
        return api.number_strongly_connected_components(_lg(G), **kw)

    @staticmethod
    def weakly_connected_components(G, **kw):
        back = _back(G)
        return iter(
            [{back[m] for m in c} for c in api.weakly_connected_components(_lg(G), **kw)]
        )

    @staticmethod
    def number_connected_components(G, **kw):
        return api.number_connected_components(_lg(G), **kw)

    @staticmethod
    def number_weakly_connected_components(G, **kw):
        return api.number_weakly_connected_components(_lg(G), **kw)

    @staticmethod
    def is_connected(G, **kw):
        import networkx as nx

        try:
            return api.is_connected(_lg(G), **kw)
        except ValueError as e:
            raise nx.NetworkXPointlessConcept(str(e)) from e

    @staticmethod
    def is_weakly_connected(G, **kw):
        import networkx as nx

        try:
            return api.is_weakly_connected(_lg(G), **kw)
        except ValueError as e:
            raise nx.NetworkXPointlessConcept(str(e)) from e

    @staticmethod
    def is_strongly_connected(G, **kw):
        import networkx as nx

        try:
            return api.is_strongly_connected(_lg(G), **kw)
        except ValueError as e:
            raise nx.NetworkXPointlessConcept(str(e)) from e

    @staticmethod
    def attracting_components(G, **kw):
        back = _back(G)
        return iter(
            [{back[m] for m in c} for c in api.attracting_components(_lg(G), **kw)]
        )

    @staticmethod
    def number_attracting_components(G, **kw):
        return api.number_attracting_components(_lg(G), **kw)

    @staticmethod
    def average_degree_connectivity(
        G, source="in+out", target="in+out", nodes=None, weight=None, **kw
    ):
        import networkx as nx

        try:
            return api.average_degree_connectivity(
                _lg(G), source=source, target=target, nodes=nodes, weight=weight, **kw
            )
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e

    @staticmethod
    def average_neighbor_degree(
        G, source="out", target="out", nodes=None, weight=None, **kw
    ):
        import networkx as nx

        back = _back(G)
        try:
            res = api.average_neighbor_degree(
                _lg(G), source=source, target=target, nodes=nodes, weight=weight, **kw
            )
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def topological_generations(G, **kw):
        import networkx as nx

        back = _back(G)
        try:
            gens = list(api.topological_generations(_lg(G), **kw))
        except ValueError as e:
            raise nx.NetworkXUnfeasible(str(e)) from e
        return iter([[back[m] for m in g] for g in gens])

    @staticmethod
    def topological_sort(G, **kw):
        import networkx as nx

        back = _back(G)
        try:
            order = list(api.topological_sort(_lg(G), **kw))
        except ValueError as e:
            raise nx.NetworkXUnfeasible(str(e)) from e
        return iter([back[m] for m in order])

    @staticmethod
    def is_directed_acyclic_graph(G, **kw):
        return api.is_directed_acyclic_graph(_lg(G), **kw)

    @staticmethod
    def dag_longest_path(G, weight="weight", default_weight=1, topo_order=None, **kw):
        import networkx as nx

        back = _back(G)
        try:
            path = api.dag_longest_path(
                _lg(G), weight=weight, default_weight=default_weight,
                topo_order=topo_order, **kw,
            )
        except ValueError as e:
            raise nx.NetworkXNotImplemented(str(e)) from e
        return [back[m] for m in path]

    @staticmethod
    def dag_longest_path_length(G, weight="weight", default_weight=1, **kw):
        import networkx as nx

        try:
            return api.dag_longest_path_length(
                _lg(G), weight=weight, default_weight=default_weight, **kw
            )
        except ValueError as e:
            raise nx.NetworkXNotImplemented(str(e)) from e

    @staticmethod
    def has_path(G, source, target, **kw):
        import networkx as nx

        try:
            return api.has_path(_lg(G), source, target, **kw)
        except ValueError as e:
            raise nx.NodeNotFound(str(e)) from e

    @staticmethod
    def single_source_shortest_path_length(G, source, cutoff=None, **kw):
        import networkx as nx

        back = _back(G)
        try:
            res = api.single_source_shortest_path_length(
                _lg(G), source, cutoff=cutoff, **kw
            )
        except ValueError as e:
            raise nx.NodeNotFound(str(e)) from e
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def _binary_setop(G, H, api_fn):
        import networkx as nx

        if G.is_directed() != H.is_directed():
            raise nx.NetworkXError("G and H must both be graphs or digraphs.")
        back = {**_back(G), **_back(H)}
        try:
            nodes, edges = api_fn(_lg(G), _lg(H))
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e
        R = G.__class__()
        R.add_nodes_from(back[n] for n in nodes)
        R.add_edges_from((back[u], back[v]) for u, v in edges)
        return R

    @staticmethod
    def compose(G, H, **kw):
        return BackendInterface._binary_setop(G, H, api.compose)

    @staticmethod
    def intersection(G, H, **kw):
        return BackendInterface._binary_setop(G, H, api.intersection)

    @staticmethod
    def difference(G, H, **kw):
        return BackendInterface._binary_setop(G, H, api.difference)

    @staticmethod
    def symmetric_difference(G, H, **kw):
        return BackendInterface._binary_setop(G, H, api.symmetric_difference)

    @staticmethod
    def degree_assortativity_coefficient(
        G, x="out", y="in", weight=None, nodes=None, **kw
    ):
        return api.degree_assortativity_coefficient(
            _lg(G), x=x, y=y, weight=weight, nodes=nodes, **kw
        )

    @staticmethod
    def degree_pearson_correlation_coefficient(
        G, x="out", y="in", weight=None, nodes=None, **kw
    ):
        # identical quantity to degree assortativity (nx computes it
        # via scipy.stats.pearsonr; the exact-sum path here is the
        # same estimator)
        return api.degree_assortativity_coefficient(
            _lg(G), x=x, y=y, weight=weight, nodes=nodes, **kw
        )

    @staticmethod
    def triadic_census(G, nodelist=None, **kw):
        return api.triadic_census(_lg(G), nodelist=nodelist)

    @staticmethod
    def eccentricity(G, v=None, sp=None, weight=None, **kw):
        import networkx as nx

        back = _back(G)
        try:
            res = api.eccentricity(_lg(G), v=v, sp=sp, weight=weight)
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e
        if not isinstance(res, dict):
            return res
        return {back[k]: v2 for k, v2 in res.items()}

    @staticmethod
    def diameter(G, e=None, usebounds=False, weight=None, **kw):
        import networkx as nx

        try:
            return api.diameter(_lg(G), e=e, usebounds=usebounds, weight=weight)
        except ValueError as err:
            raise nx.NetworkXError(str(err)) from err

    @staticmethod
    def radius(G, e=None, usebounds=False, weight=None, **kw):
        import networkx as nx

        try:
            return api.radius(_lg(G), e=e, usebounds=usebounds, weight=weight)
        except ValueError as err:
            raise nx.NetworkXError(str(err)) from err

    @staticmethod
    def center(G, e=None, usebounds=False, weight=None, **kw):
        import networkx as nx

        back = _back(G)
        try:
            return [
                back[k]
                for k in api.center(_lg(G), e=e, usebounds=usebounds, weight=weight)
            ]
        except ValueError as err:
            raise nx.NetworkXError(str(err)) from err

    @staticmethod
    def periphery(G, e=None, usebounds=False, weight=None, **kw):
        import networkx as nx

        back = _back(G)
        try:
            return [
                back[k]
                for k in api.periphery(
                    _lg(G), e=e, usebounds=usebounds, weight=weight
                )
            ]
        except ValueError as err:
            raise nx.NetworkXError(str(err)) from err

    @staticmethod
    def barycenter(G, weight=None, attr=None, sp=None, **kw):
        import networkx as nx

        back = _back(G)
        try:
            return [
                back[k]
                for k in api.barycenter(_lg(G), weight=weight, attr=attr, sp=sp)
            ]
        except ValueError as err:
            raise nx.NetworkXNoPath(str(err)) from err

    @staticmethod
    def wiener_index(G, weight=None, **kw):
        return api.wiener_index(_lg(G), weight=weight)

    @staticmethod
    def average_shortest_path_length(G, weight=None, method=None, **kw):
        import networkx as nx

        try:
            return api.average_shortest_path_length(
                _lg(G), weight=weight, method=method
            )
        except ValueError as err:
            if "null graph" in str(err):
                raise nx.NetworkXPointlessConcept(str(err)) from err
            raise nx.NetworkXError(str(err)) from err

    @staticmethod
    def local_reaching_centrality(
        G, v, paths=None, weight=None, normalized=True, **kw
    ):
        import networkx as nx

        try:
            return api.local_reaching_centrality(
                _lg(G), v, paths=paths, weight=weight, normalized=normalized
            )
        except ValueError as err:
            raise nx.NetworkXError(str(err)) from err

    @staticmethod
    def global_reaching_centrality(G, weight=None, normalized=True, **kw):
        import networkx as nx

        try:
            return api.global_reaching_centrality(
                _lg(G), weight=weight, normalized=normalized
            )
        except ValueError as err:
            raise nx.NetworkXError(str(err)) from err

    @staticmethod
    def laplacian_centrality(
        G, normalized=True, nodelist=None, walk_type=None, alpha=0.95,
        weight="weight", **kw
    ):
        import networkx as nx

        back = _back(G)
        try:
            res = api.laplacian_centrality(
                _lg(G), normalized=normalized, nodelist=nodelist,
                walk_type=walk_type, alpha=alpha, weight=weight,
            )
        except ValueError as e:
            raise nx.NetworkXPointlessConcept(str(e)) from e
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def is_tree(G, **kw):
        import networkx as nx

        try:
            return api.is_tree(_lg(G))
        except ValueError as e:
            raise nx.NetworkXPointlessConcept(str(e)) from e

    @staticmethod
    def is_forest(G, **kw):
        import networkx as nx

        try:
            return api.is_forest(_lg(G))
        except ValueError as e:
            raise nx.NetworkXPointlessConcept(str(e)) from e

    @staticmethod
    def is_branching(G, **kw):
        return api.is_branching(_lg(G))

    @staticmethod
    def is_arborescence(G, **kw):
        return api.is_arborescence(_lg(G))

    @staticmethod
    def trophic_levels(G, weight="weight", **kw):
        import networkx as nx

        back = _back(G)
        try:
            res = api.trophic_levels(_lg(G), weight=weight)
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def trophic_differences(G, weight="weight", **kw):
        import networkx as nx

        back = _back(G)
        try:
            res = api.trophic_differences(_lg(G), weight=weight)
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e
        return {(back[u], back[v]): d for (u, v), d in res.items()}

    @staticmethod
    def trophic_incoherence_parameter(
        G, weight="weight", cannibalism=False, **kw
    ):
        import networkx as nx

        try:
            return api.trophic_incoherence_parameter(
                _lg(G), weight=weight, cannibalism=cannibalism
            )
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e

    @staticmethod
    def harmonic_function(G, max_iter=30, label_name="label", **kw):
        import networkx as nx

        seeds = {
            n: d[label_name] for n, d in G.nodes(data=True) if label_name in d
        }
        if not seeds:
            raise nx.NetworkXError(
                f"No node on the input graph is labeled by '{label_name}'."
            )
        res = api.harmonic_function(_lg(G), seeds, max_iter=max_iter)
        # nx returns predicted labels as a LIST in G's node order; the
        # original (non-str) label objects are restored via the seeds
        lbl = {str(v): v for v in seeds.values()}
        return [lbl[res[k]] for k in (str(n) for n in G)]

    @staticmethod
    def local_and_global_consistency(
        G, alpha=0.99, max_iter=30, label_name="label", **kw
    ):
        import networkx as nx

        seeds = {
            n: d[label_name] for n, d in G.nodes(data=True) if label_name in d
        }
        if not seeds:
            raise nx.NetworkXError(
                f"No node on the input graph is labeled by '{label_name}'."
            )
        res = api.local_and_global_consistency(
            _lg(G), seeds, alpha=alpha, max_iter=max_iter
        )
        lbl = {str(v): v for v in seeds.values()}
        return [lbl[res[k]] for k in (str(n) for n in G)]

    @staticmethod
    def partition_quality(G, partition, **kw):
        import networkx as nx
        from networkx.algorithms.community.community_utils import is_partition

        if not is_partition(G, partition):
            raise nx.NetworkXError("`partition` is not a valid partition of G")
        return api.partition_quality(_lg(G), partition)

    @staticmethod
    def constraint(G, nodes=None, weight=None, **kw):
        back = _back(G)
        res = api.constraint(_lg(G), nodes=nodes, weight=weight)
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def local_constraint(G, u, v, weight=None, **kw):
        return api.local_constraint(_lg(G), u, v, weight=weight)

    @staticmethod
    def cut_size(G, S, T=None, weight=None, **kw):
        return api.cut_size(_lg(G), S, T=T, weight=weight)

    @staticmethod
    def volume(G, S, weight=None, **kw):
        return api.volume(_lg(G), S, weight=weight)

    @staticmethod
    def conductance(G, S, T=None, weight=None, **kw):
        return api.conductance(_lg(G), S, T=T, weight=weight)

    @staticmethod
    def normalized_cut_size(G, S, T=None, weight=None, **kw):
        return api.normalized_cut_size(_lg(G), S, T=T, weight=weight)

    @staticmethod
    def edge_expansion(G, S, T=None, weight=None, **kw):
        return api.edge_expansion(_lg(G), S, T=T, weight=weight)

    @staticmethod
    def mixing_expansion(G, S, T=None, weight=None, **kw):
        return api.mixing_expansion(_lg(G), S, T=T, weight=weight)

    @staticmethod
    def node_expansion(G, S, **kw):
        return api.node_expansion(_lg(G), S)

    @staticmethod
    def boundary_expansion(G, S, **kw):
        return api.boundary_expansion(_lg(G), S)

    @staticmethod
    def node_boundary(G, nbunch1, nbunch2=None, **kw):
        back = _back(G)
        return {back[k] for k in api.node_boundary(_lg(G), nbunch1, nbunch2)}

    @staticmethod
    def edge_boundary(G, nbunch1, nbunch2=None, data=False, keys=False,
                      default=None, **kw):
        if data:
            raise NotImplementedError("edge_boundary data= is not supported")
        back = _back(G)
        return iter(
            [
                (back[u], back[v])
                for u, v in api.edge_boundary(_lg(G), nbunch1, nbunch2)
            ]
        )

    @staticmethod
    def voterank(G, number_of_nodes=None, **kw):
        back = _back(G)
        return [
            back[v] for v in api.voterank(_lg(G), number_of_nodes=number_of_nodes)
        ]

    @staticmethod
    def maximal_matching(G, **kw):
        back = _back(G)
        return {
            (back[u], back[v]) for u, v in api.maximal_matching(_lg(G))
        }

    @staticmethod
    def min_weighted_vertex_cover(G, weight=None, **kw):
        back = _back(G)
        return {
            back[v] for v in api.min_weighted_vertex_cover(_lg(G), weight=weight)
        }

    @staticmethod
    def dominating_set(G, start_with=None, **kw):
        back = _back(G)
        sw = None if start_with is None else str(start_with)
        return {back[v] for v in api.dominating_set(_lg(G), start_with=sw)}

    @staticmethod
    def greedy_color(G, strategy="largest_first", interchange=False, **kw):
        back = _back(G)
        return {
            back[v]: c for v, c in api.greedy_color(_lg(G), strategy=strategy).items()
        }

    @staticmethod
    def maximal_independent_set(G, nodes=None, seed=None, **kw):
        back = _back(G)
        return [
            back[v]
            for v in api.maximal_independent_set(_lg(G), nodes=nodes, seed=seed)
        ]

    @staticmethod
    def s_metric(G, **kw):
        return api.s_metric(_lg(G), **kw)

    @staticmethod
    def global_efficiency(G, **kw):
        return api.global_efficiency(_lg(G))

    @staticmethod
    def rich_club_coefficient(G, normalized=True, Q=100, seed=None, **kw):
        import networkx as nx

        try:
            return api.rich_club_coefficient(
                _lg(G), normalized=normalized, Q=Q, seed=seed
            )
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e

    @staticmethod
    def effective_size(G, nodes=None, weight=None, **kw):
        back = _back(G)
        res = api.effective_size(_lg(G), nodes=nodes, weight=weight)
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def isolates(G, **kw):
        back = _back(G)
        return iter([back[k] for k in api.isolates(_lg(G))])

    @staticmethod
    def number_of_isolates(G, **kw):
        return api.number_of_isolates(_lg(G))

    @staticmethod
    def is_bipartite(G, **kw):
        return api.is_bipartite(_lg(G))

    @staticmethod
    def color(G, **kw):
        import networkx as nx

        back = _back(G)
        try:
            res = api.bipartite_color(_lg(G))
        except ValueError as e:
            raise nx.NetworkXError(str(e)) from e
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def condensation(G, scc=None, **kw):
        import networkx as nx

        if scc is not None:
            # caller supplied the partition (original node keys):
            # honor it verbatim (nx contract) — pure-python assembly
            # at adapter scale
            comps = [set(c) for c in scc]
            mapping = {n: i for i, c in enumerate(comps) for n in c}
        else:
            back = _back(G)
            members, comp_edges = api.condensation(_lg(G))
            ids = sorted(members)  # deterministic 0..k-1 labeling
            idx = {sid: i for i, sid in enumerate(ids)}
            comps = [{back[m] for m in members[sid]} for sid in ids]
            mapping = {n: i for i, c in enumerate(comps) for n in c}
        C = nx.DiGraph()
        C.add_nodes_from(range(len(comps)))
        for i, c in enumerate(comps):
            C.nodes[i]["members"] = c
        if scc is not None:
            C.add_edges_from(
                (mapping[u], mapping[v])
                for u, v in G.edges()
                if mapping[u] != mapping[v]
            )
        else:
            C.add_edges_from((idx[a], idx[b]) for a, b in comp_edges)
        C.graph["mapping"] = mapping
        return C

    @staticmethod
    def triangles(G, nodes=None, **kw):
        res = api.triangles(_lg(G), nodes=nodes, **kw)
        back = _back(G)
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def clustering(G, nodes=None, weight=None, **kw):
        res = api.clustering(_lg(G), nodes=nodes, weight=weight, **kw)
        if not isinstance(res, dict):
            return res
        back = _back(G)
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def square_clustering(G, nodes=None, **kw):
        res = api.square_clustering(_lg(G), nodes=nodes)
        if not isinstance(res, dict):
            return res
        back = _back(G)
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def transitivity(G, **kw):
        return api.transitivity(_lg(G), **kw)

    @staticmethod
    def average_clustering(G, nodes=None, weight=None, count_zeros=True, **kw):
        return api.average_clustering(
            _lg(G), nodes=nodes, weight=weight, count_zeros=count_zeros, **kw
        )

    @staticmethod
    def reciprocity(G, nodes=None, **kw):
        res = api.reciprocity(_lg(G), nodes=nodes, **kw)
        if not isinstance(res, dict):
            return res
        back = _back(G)
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def overall_reciprocity(G, **kw):
        return api.overall_reciprocity(_lg(G), **kw)

    @staticmethod
    def harmonic_centrality(G, nbunch=None, distance=None, sources=None, **kw):
        res = api.harmonic_centrality(
            _lg(G), nbunch=nbunch, distance=distance, sources=sources, **kw
        )
        back = _back(G)
        return {back[k]: v for k, v in res.items()}

    # -- round-4 link-graph extensions ----------------------------------

    @staticmethod
    def betweenness_centrality(
        G, k=None, normalized=True, weight=None, endpoints=False, seed=None, **kw
    ):
        back = _back(G)
        res = api.betweenness_centrality(
            _lg(G),
            k=k,
            normalized=normalized,
            weight=weight,
            endpoints=endpoints,
            seed=seed,
            **kw,
        )
        return {back[k2]: v for k2, v in res.items()}

    @staticmethod
    def edge_betweenness_centrality(
        G, k=None, normalized=True, weight=None, seed=None, **kw
    ):
        back = _back(G)
        res = api.edge_betweenness_centrality(
            _lg(G), k=k, normalized=normalized, weight=weight, seed=seed, **kw
        )
        if G.is_directed():
            return {(back[u], back[v]): b for (u, v), b in res.items()}
        # undirected: key by the orientation G.edges itself reports
        key_of = {frozenset((u, v)): (u, v) for u, v in G.edges}
        return {
            key_of[frozenset((back[u], back[v]))]: b for (u, v), b in res.items()
        }

    @staticmethod
    def eigenvector_centrality(G, max_iter=100, tol=1e-06, nstart=None, weight=None, **kw):
        back = _back(G)
        res = api.eigenvector_centrality(
            _lg(G), max_iter=max_iter, tol=tol, nstart=nstart, weight=weight, **kw
        )
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def katz_centrality(
        G, alpha=0.1, beta=1.0, max_iter=1000, tol=1e-06, nstart=None,
        normalized=True, weight=None, **kw,
    ):
        back = _back(G)
        res = api.katz_centrality(
            _lg(G), alpha=alpha, beta=beta, max_iter=max_iter, tol=tol,
            nstart=nstart, normalized=normalized, weight=weight, **kw,
        )
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def core_number(G, **kw):
        back = _back(G)
        return {back[k]: v for k, v in api.core_number(_lg(G), **kw).items()}

    @staticmethod
    def k_core(G, k=None, core_number=None, **kw):
        # nx.k_core returns a subgraph view; honor a precomputed
        # core_number dict the way networkx does
        if core_number is not None:
            if k is None:
                k = max(core_number.values())
            keep = [n for n, c in core_number.items() if c >= k]
            return G.subgraph(keep)
        back = _back(G)
        names = api.k_core_nodes(_lg(G), k=k)
        return G.subgraph([back[m] for m in names])

    @staticmethod
    def _core_dict(G, core_number):
        # distributed core decomposition unless the caller supplied one
        if core_number is not None:
            return core_number
        back = _back(G)
        return {back[n]: c for n, c in api.core_number(_lg(G)).items()}

    @staticmethod
    def k_shell(G, k=None, core_number=None, **kw):
        c = BackendInterface._core_dict(G, core_number)
        if k is None:
            k = max(c.values()) if c else 0
        return G.subgraph([v for v, cv in c.items() if cv == k]).copy()

    @staticmethod
    def k_crust(G, k=None, core_number=None, **kw):
        c = BackendInterface._core_dict(G, core_number)
        if k is None:
            k = (max(c.values()) - 1) if c else 0
        return G.subgraph([v for v, cv in c.items() if cv <= k]).copy()

    @staticmethod
    def k_corona(G, k, core_number=None, **kw):
        c = BackendInterface._core_dict(G, core_number)
        keep = [
            v
            for v, cv in c.items()
            if cv == k and k == sum(1 for w in G[v] if c[w] >= k)
        ]
        return G.subgraph(keep).copy()

    @staticmethod
    def k_truss(G, k, **kw):
        # nx.k_truss returns a pruned COPY (truss edges only, isolated
        # nodes dropped each peel round) and raises on self-loops /
        # directed input; mirror both before dispatching the edge-set
        # computation to operators/ktruss.py
        import networkx as nx

        if G.is_directed():
            raise nx.NetworkXNotImplemented(
                "k_truss is not implemented for directed graphs"
            )
        if nx.number_of_selfloops(G) > 0:
            raise nx.NetworkXNotImplemented(
                "Input graph has self loops which is not permitted; "
                "Consider using G.remove_edges_from(nx.selfloop_edges(G))."
            )
        back = _back(G)
        keep = {
            frozenset((back[a], back[b]))
            for pair in api.k_truss_edges(_lg(G), k=k)
            for a, b in [tuple(pair)]
        }
        H = G.copy()
        H.remove_edges_from(
            [(u, v) for u, v in H.edges if frozenset((u, v)) not in keep]
        )
        H.remove_nodes_from([n for n in list(H) if H.degree(n) == 0])
        return H

    @staticmethod
    def minimum_spanning_edges(
        G, algorithm="kruskal", weight="weight", keys=True, data=True,
        ignore_nan=False, **kw,
    ):
        # `algorithm` selects nx's sequential strategy; the result set
        # is algorithm-independent on distinct-weight graphs, and the
        # engine always runs distributed Boruvka (operators/msf.py).
        # Yield order mirrors kruskal: ascending (weight, u, v).
        import networkx as nx

        if G.is_directed():
            raise nx.NetworkXNotImplemented(
                "minimum_spanning_edges is not implemented for directed graphs"
            )
        if G.is_multigraph():
            raise nx.NetworkXNotImplemented(
                "spanning-forest dispatch is not implemented for multigraphs"
            )
        maximum = kw.pop("_maximum", False)
        back = _back(G)
        pairs = api.minimum_spanning_edge_list(
            _weighted_lg(G, weight, ignore_nan), maximum=maximum
        )
        chosen = [(back[a], back[b]) for a, b in pairs]
        chosen.sort(
            key=lambda e: (
                (-1 if maximum else 1) * G[e[0]][e[1]].get(weight, 1),
                str(e[0]), str(e[1]),
            )
        )
        for u, v in chosen:
            yield (u, v, G[u][v]) if data else (u, v)

    @staticmethod
    def maximum_spanning_edges(
        G, algorithm="kruskal", weight="weight", keys=True, data=True,
        ignore_nan=False, **kw,
    ):
        yield from BackendInterface.minimum_spanning_edges(
            G, algorithm=algorithm, weight=weight, keys=keys, data=data,
            ignore_nan=ignore_nan, _maximum=True,
        )

    @staticmethod
    def minimum_spanning_tree(G, weight="weight", algorithm="kruskal",
                              ignore_nan=False, **kw):
        # nx returns a fresh Graph with ALL nodes (graph/node/edge data
        # shallow-copied) and only the forest edges
        H = G.__class__()
        H.graph.update(G.graph)
        H.add_nodes_from(G.nodes(data=True))
        for u, v, d in BackendInterface.minimum_spanning_edges(
            G, algorithm=algorithm, weight=weight, ignore_nan=ignore_nan,
            **kw,
        ):
            H.add_edge(u, v, **d)
        return H

    @staticmethod
    def maximum_spanning_tree(G, weight="weight", algorithm="kruskal",
                              ignore_nan=False, **kw):
        H = G.__class__()
        H.graph.update(G.graph)
        H.add_nodes_from(G.nodes(data=True))
        for u, v, d in BackendInterface.maximum_spanning_edges(
            G, algorithm=algorithm, weight=weight, ignore_nan=ignore_nan,
            **kw,
        ):
            H.add_edge(u, v, **d)
        return H

    @staticmethod
    def single_source_dijkstra_path_length(G, source, cutoff=None, weight="weight", **kw):
        back = _back(G)
        res = api.single_source_dijkstra_path_length(
            _lg(G), source, cutoff=cutoff, weight=weight, **kw
        )
        return {back[k]: v for k, v in res.items()}

    @staticmethod
    def jaccard_coefficient(G, ebunch=None, **kw):
        back = _back(G)
        for u, v, p in api.jaccard_coefficient(_lg(G), ebunch=ebunch, **kw):
            yield (back[u], back[v], p)

    @staticmethod
    def adamic_adar_index(G, ebunch=None, **kw):
        back = _back(G)
        for u, v, p in api.adamic_adar_index(_lg(G), ebunch=ebunch, **kw):
            yield (back[u], back[v], p)

    @staticmethod
    def resource_allocation_index(G, ebunch=None, **kw):
        back = _back(G)
        for u, v, p in api.resource_allocation_index(_lg(G), ebunch=ebunch, **kw):
            yield (back[u], back[v], p)

    @staticmethod
    def preferential_attachment(G, ebunch=None, **kw):
        back = _back(G)
        for u, v, p in api.preferential_attachment(_lg(G), ebunch=ebunch, **kw):
            yield (back[u], back[v], p)

    @staticmethod
    def _node_communities(G, community: str) -> dict:
        """Extract {name: community} from the nx node attribute the
        Soundarajan–Hopcroft functions key on (missing nodes are left
        out; api._communities_df raises nx's error for the gap)."""
        return {
            str(n): d[community]
            for n, d in G.nodes(data=True)
            if community in d
        }

    @staticmethod
    def cn_soundarajan_hopcroft(G, ebunch=None, community="community", **kw):
        back = _back(G)
        coms = BackendInterface._node_communities(G, community)
        for u, v, p in api.cn_soundarajan_hopcroft(
            _lg(G), ebunch=ebunch, communities=coms, **kw
        ):
            yield (back[u], back[v], p)

    @staticmethod
    def ra_index_soundarajan_hopcroft(G, ebunch=None, community="community", **kw):
        back = _back(G)
        coms = BackendInterface._node_communities(G, community)
        for u, v, p in api.ra_index_soundarajan_hopcroft(
            _lg(G), ebunch=ebunch, communities=coms, **kw
        ):
            yield (back[u], back[v], p)

    @staticmethod
    def within_inter_cluster(
        G, ebunch=None, delta=0.001, community="community", **kw
    ):
        back = _back(G)
        coms = BackendInterface._node_communities(G, community)
        for u, v, p in api.within_inter_cluster(
            _lg(G), ebunch=ebunch, delta=delta, communities=coms, **kw
        ):
            yield (back[u], back[v], p)

    @staticmethod
    def common_neighbor_centrality(G, ebunch=None, alpha=0.8, **kw):
        back = _back(G)
        for u, v, p in api.common_neighbor_centrality(
            _lg(G), ebunch=ebunch, alpha=alpha, **kw
        ):
            yield (back[u], back[v], p)

    @staticmethod
    def _bridge_scope(G, root):
        """nx's ``root`` contract: restrict to root's component
        (NodeNotFound if absent). Undirected-only, like nx.bridges."""
        import networkx as nx

        if G.is_directed():
            raise nx.NetworkXNotImplemented(
                "bridges is not implemented for directed graphs"
            )
        if G.is_multigraph():
            # LinkGraph.from_networkx flattens parallel edges, so an
            # edge with multiplicity > 1 would be reported as a bridge
            # where nx correctly excludes it — refuse so nx falls back
            # (same guard onion_layers and the projections use)
            raise nx.NetworkXNotImplemented(
                "bridges on multigraphs is not implemented by the spark "
                "backend (parallel edges would be flattened)"
            )
        if root is None:
            return G
        if root not in G:
            raise nx.NodeNotFound(f"node {root} not in G")
        return G.subgraph(nx.node_connected_component(G, root))

    @staticmethod
    def bridges(G, root=None, **kw):
        back = _back(G)
        H = BackendInterface._bridge_scope(G, root)
        for a, b in api.bridge_list(_lg(H)):
            yield (back[a], back[b])

    @staticmethod
    def has_bridges(G, root=None, **kw):
        H = BackendInterface._bridge_scope(G, root)
        return api.has_bridges(_lg(H))

    @staticmethod
    def local_bridges(G, with_span=True, weight=None, **kw):
        import math

        import networkx as nx

        if G.is_directed():
            raise nx.NetworkXNotImplemented(
                "local_bridges is not implemented for directed graphs"
            )
        if G.is_multigraph():
            raise nx.NetworkXNotImplemented(
                "local_bridges on multigraphs is not implemented by the "
                "spark backend (parallel edges would be flattened)"
            )
        if weight is not None:
            raise nx.NetworkXNotImplemented(
                "weighted local-bridge spans are not implemented by the "
                "spark backend"
            )
        back = _back(G)
        if not with_span:
            for a, b in api.local_bridge_list(_lg(G), with_span=False):
                yield (back[a], back[b])
            return
        for a, b, s in api.local_bridge_list(_lg(G), with_span=True):
            yield (back[a], back[b], math.inf if s is None else s)

    @staticmethod
    def k_edge_components(G, k, **kw):
        # k=1 -> connected components; k=2 -> components minus bridges
        # (operators/bridges.py). k>=3 needs Karger-style cut machinery
        # the backend doesn't carry.
        import networkx as nx

        if G.is_directed():
            raise nx.NetworkXNotImplemented(
                "k_edge_components is not implemented for directed graphs"
            )
        if k < 1:
            raise ValueError("k cannot be less than 1")
        if G.is_multigraph() and k == 2:
            # the k=2 path subtracts bridges, and parallel edges are
            # flattened by LinkGraph.from_networkx (see _bridge_scope)
            raise nx.NetworkXNotImplemented(
                "k_edge_components(k=2) on multigraphs is not implemented "
                "by the spark backend (parallel edges would be flattened)"
            )
        back = _back(G)
        if k == 1:
            for comp in api.connected_components(_lg(G)):
                yield {back[n] for n in comp}
            return
        if k > 2:
            raise nx.NetworkXNotImplemented(
                "k_edge_components with k>2 is not implemented by the "
                "spark backend"
            )
        for comp in api.two_edge_component_sets(_lg(G)):
            yield {back[n] for n in comp}

    @staticmethod
    def onion_layers(G, **kw):
        import networkx as nx

        if G.is_directed():
            raise nx.NetworkXNotImplemented(
                "onion_layers is not implemented for directed graphs"
            )
        if G.is_multigraph():
            raise nx.NetworkXNotImplemented(
                "onion_layers is not implemented for multigraphs"
            )
        back = _back(G)
        return {back[n]: l for n, l in api.onion_layer_dict(_lg(G)).items()}

    @staticmethod
    def percolation_centrality(
        G, attribute="percolation", states=None, weight=None, **kw
    ):
        # nx: states dict wins; else the node attribute with default=1
        # (nx 3.6 uses nx.get_node_attributes(G, attribute, default=1),
        # so the documented no-attributes call degrades to betweenness
        # instead of raising KeyError)
        if states is None:
            states = {n: G.nodes[n].get(attribute, 1) for n in G.nodes}
        back = _back(G)
        named = {str(n): float(states[n]) for n in G.nodes}
        return {
            back[n]: v
            for n, v in api.percolation_centrality_dict(
                _lg(G), named, weight=weight
            ).items()
        }

    @staticmethod
    def _projection(B, nodes, weight_key):
        """Shared builder for the nx.bipartite projection family:
        a Graph over ``nodes`` (data copied, nx parity) with edges
        weighted by one column of the single-pass wedge aggregate."""
        import networkx as nx

        if B.is_directed():
            raise nx.NetworkXNotImplemented(
                "directed bipartite projections are not implemented by "
                "the spark backend"
            )
        if B.is_multigraph():
            raise nx.NetworkXNotImplemented(
                "multigraph bipartite projections are not implemented by "
                "the spark backend"
            )
        back = _back(B)
        weights = api.bipartite_projection_weights(
            _lg(B), [str(n) for n in nodes]
        )
        H = nx.Graph()
        H.graph.update(B.graph)
        H.add_nodes_from((n, B.nodes[n]) for n in nodes)
        for (a, b), w in weights.items():
            if weight_key is None:
                H.add_edge(back[a], back[b])
            else:
                H.add_edge(back[a], back[b], weight=w[weight_key])
        return H

    @staticmethod
    def projected_graph(B, nodes, multigraph=False, **kw):
        import networkx as nx

        if multigraph:
            raise nx.NetworkXNotImplemented(
                "multigraph projection is not implemented by the spark "
                "backend"
            )
        return BackendInterface._projection(B, nodes, None)

    @staticmethod
    def weighted_projected_graph(B, nodes, ratio=False, **kw):
        return BackendInterface._projection(
            B, nodes, "ratio" if ratio else "common"
        )

    @staticmethod
    def overlap_weighted_projected_graph(B, nodes, jaccard=True, **kw):
        return BackendInterface._projection(
            B, nodes, "jaccard" if jaccard else "overlap_min"
        )

    @staticmethod
    def collaboration_weighted_projected_graph(B, nodes, **kw):
        return BackendInterface._projection(B, nodes, "collab")

    @staticmethod
    def simrank_similarity(
        G,
        source=None,
        target=None,
        importance_factor=0.9,
        max_iterations=1000,
        tolerance=1e-4,
        **kw,
    ):
        import networkx as nx

        from nx_neptune_spark.operators.simrank import ExceededMaxIterations

        if source is not None and source not in G:
            raise nx.NodeNotFound(f"Source node {source} not in G")
        if target is not None and target not in G:
            raise nx.NodeNotFound(f"Target node {target} not in G")
        if any(d.get("weight", 1) != 1 for _, _, d in G.edges(data=True)):
            # nx 3.6's numpy implementation column-normalizes the
            # WEIGHTED adjacency (to_numpy_array honors 'weight'); the
            # operator uses unweighted distinct in-neighbor sets, which
            # silently diverges — refuse so nx falls back
            raise nx.NetworkXNotImplemented(
                "simrank_similarity on weighted graphs is not implemented "
                "by the spark backend (unweighted in-neighbor sets would "
                "silently diverge from nx's weighted normalization)"
            )
        back = _back(G)
        try:
            dense = api.simrank_similarity_dict(
                _lg(G),
                importance_factor=importance_factor,
                max_iterations=max_iterations,
                tolerance=tolerance,
            )
        except ExceededMaxIterations as exc:
            raise nx.ExceededMaxIterations(str(exc)) from exc
        out = {
            back[a]: {back[b]: v for b, v in row.items()}
            for a, row in dense.items()
        }
        if source is not None and target is not None:
            return out[source][target]
        if source is not None:
            return out[source]
        return out

    @staticmethod
    def load_centrality(
        G, v=None, cutoff=None, normalized=True, weight=None, **kw
    ):
        back = _back(G)
        out = {
            back[n]: x
            for n, x in api.load_centrality_dict(
                _lg(G), normalized=normalized, weight=weight, cutoff=cutoff
            ).items()
        }
        return out[v] if v is not None else out

    # nx exports load under both names
    newman_betweenness_centrality = load_centrality

    @staticmethod
    def attribute_assortativity_coefficient(G, attribute, nodes=None, **kw):
        # nx's node_attribute_xy uses .get(attr, None): missing
        # attributes mix as their own category
        values = {n: G.nodes[n].get(attribute) for n in G.nodes}
        names = None if nodes is None else [str(n) for n in nodes]
        return api.attribute_assortativity(_lg(G), values, node_names=names)

    @staticmethod
    def numeric_assortativity_coefficient(G, attribute, nodes=None, **kw):
        values = {n: G.nodes[n][attribute] for n in G.nodes}
        names = None if nodes is None else [str(n) for n in nodes]
        return api.numeric_assortativity(_lg(G), values, node_names=names)

    @staticmethod
    def is_eulerian(G, **kw):
        return api.is_eulerian(_lg(G))

    @staticmethod
    def has_eulerian_path(G, source=None, **kw):
        return api.has_eulerian_path(
            _lg(G), source=None if source is None else str(source)
        )

    @staticmethod
    def is_semieulerian(G, **kw):
        return api.is_semieulerian(_lg(G))

    @staticmethod
    def transitive_closure(G, reflexive=False, **kw):
        import networkx as nx

        if not G.is_directed():
            raise nx.NetworkXNotImplemented(
                "undirected transitive_closure is not implemented by the "
                "spark backend (nx treats it as component cliques)"
            )
        back = _back(G)
        H = G.__class__()
        H.graph.update(G.graph)
        H.add_nodes_from(G.nodes(data=True))
        # nx starts from G.copy(), so data on pre-existing edges
        # survives in the closure; add originals (with attrs) first —
        # closure pairs that already exist are then no-ops attr-wise
        H.add_edges_from(G.edges(data=True))
        for a, b in api.transitive_closure_pairs(_lg(G), reflexive=reflexive):
            if not H.has_edge(back[a], back[b]):
                H.add_edge(back[a], back[b])
        return H

    @staticmethod
    def transitive_closure_dag(G, topo_order=None, **kw):
        # same output as reflexive=False on a DAG; topo_order is a
        # performance hint nx uses for its sequential pass
        return BackendInterface.transitive_closure(G, reflexive=False)

    @staticmethod
    def transitive_reduction(G, **kw):
        import networkx as nx

        if not G.is_directed():
            raise nx.NetworkXNotImplemented(
                "transitive_reduction is not implemented for undirected "
                "graphs"
            )
        back = _back(G)
        try:
            pairs = api.transitive_reduction_pairs(_lg(G))
        except ValueError as exc:
            raise nx.NetworkXError(str(exc)) from exc
        H = G.__class__()
        H.add_nodes_from(G.nodes)
        for a, b in pairs:
            H.add_edge(back[a], back[b])
        return H

    @staticmethod
    def dispersion(G, u=None, v=None, normalized=True, alpha=1.0, b=0.0, c=0.0, **kw):
        import networkx as nx

        if G.is_directed():
            raise nx.NetworkXNotImplemented(
                "dispersion is not implemented for directed graphs by the "
                "spark backend"
            )
        if u is not None and v is not None:
            # nx computes _dispersion(G, u, v) for ARBITRARY pairs (the
            # common-neighbor spread of a non-adjacent pair is the
            # link-prediction use case), while the operator's table only
            # covers adjacent pairs. Mirror nx's single-pair witness
            # test locally — an ego-scale computation, same formula.
            from itertools import combinations

            u_nbrs = set(G[u])
            st = {n for n in G[v] if n in u_nbrs}
            set_uv = {u, v}
            total = 0
            for s, t in combinations(st, 2):
                nbrs_s = u_nbrs.intersection(G[s]) - set_uv
                if t not in nbrs_s and nbrs_s.isdisjoint(G[t]):
                    total += 1
            val: float | int = total
            if normalized:
                val = (total + b) ** alpha
                if len(st) + c != 0:
                    val /= len(st) + c
            return val
        back = _back(G)
        table = api.dispersion_table(
            _lg(G), normalized=normalized, alpha=alpha, b=b, c=c
        )
        full: dict = {n: {} for n in G}
        for (a, bb), x in table.items():
            full[back[a]][back[bb]] = x
        if u is None and v is None:
            return full
        if u is None:
            # nx: for v specified, results[u] = dispersion(v, u)
            return {uu: full[v][uu] for uu in G[v]}
        return dict(full[u])

    @staticmethod
    def girvan_newman(G, most_valuable_edge=None, **kw):
        # Each divisive level: repeatedly remove the highest
        # edge-betweenness edge (OUR exact batched-Brandes operator,
        # all pivots) until the component count grows, then yield the
        # components (our star-contraction CC). Ties broken by
        # (score, u, v) — deterministic where nx's dict-order max is
        # not; parity holds on tie-free graphs.
        import networkx as nx

        # nx: the working graph is the UNDIRECTED copy, self-loops
        # dropped; an edgeless graph yields its components once
        H = G.copy().to_undirected()
        H.remove_edges_from(nx.selfloop_edges(H))

        def _most_valuable(h):
            if most_valuable_edge is not None:
                return most_valuable_edge(h)
            vals = api.edge_betweenness_centrality(_lg(h))
            back = _back(h)
            best = max(vals.items(), key=lambda kv: (kv[1], kv[0]))
            return (back[best[0][0]], back[best[0][1]])

        def _components(h):
            back = _back(h)
            return tuple(
                {back[n] for n in c}
                for c in api.connected_components(_lg(h))
            )

        def _levels():
            if H.number_of_edges() == 0:
                yield _components(H)
                return
            while H.number_of_edges() > 0:
                base = len(_components(H))
                ncomp = base
                while ncomp <= base:
                    H.remove_edge(*_most_valuable(H))
                    comps = _components(H)
                    ncomp = len(comps)
                yield comps

        return _levels()

    @staticmethod
    def efficiency(G, u, v, **kw):
        # nx.efficiency: 1/d(u,v), 0 when unreachable; undirected only
        import networkx as nx

        if G.is_directed():
            raise nx.NetworkXNotImplemented(
                "efficiency is not implemented for directed graphs"
            )
        lengths = api.single_source_shortest_path_length(_lg(G), str(u))
        d = lengths.get(str(v))
        if d is None:
            return 0  # nx: NetworkXNoPath -> 0
        return 1 / d  # u == v: ZeroDivisionError, exactly like nx

    @staticmethod
    def generalized_degree(G, nodes=None, **kw):
        from collections import Counter

        import networkx as nx

        if G.is_directed():
            raise nx.NetworkXNotImplemented(
                "generalized_degree is not implemented for directed graphs"
            )
        back = _back(G)
        table = api.generalized_degree_dict(_lg(G))
        full = {back[n]: Counter(c) for n, c in table.items()}
        if nodes is None:
            return full
        if nodes in G:
            return full[nodes]
        return {n: full[n] for n in nodes}


def get_info() -> dict:
    """``networkx.backend_info`` payload (reference: nx_plugin:get_info)."""
    return {
        "backend_name": "spark",
        "project": "nx-neptune-spark",
        "package": "nx_neptune_spark",
        "url": "https://github.com/awslabs/nx-neptune",
        "short_summary": "PySpark DataFrame-native link-graph analytics backend.",
        "functions": {name: {} for name in ALGORITHMS},
    }


class _EntryPointShim:
    """Duck-types importlib.metadata.EntryPoint for runtime registration."""

    name = "spark"
    group = "networkx.backends"
    value = "nx_neptune_spark.interface:BackendInterface"

    def load(self):
        return BackendInterface


def register(name: str = "spark") -> str:
    """Register the backend with an already-imported networkx.

    Equivalent to the pyproject entry points taking effect at import
    time; needed when running from a source checkout. Idempotent.
    """
    from networkx.utils import backends as _b

    _b.backends[name] = _EntryPointShim()
    _b.backend_info[name] = get_info()
    _b._loaded_backends.pop(name, None)
    # NetworkX binds __call__ at import time to a no-backends fast path
    # when the entry-point scan found nothing; rebind to the dispatching
    # variant now that a backend exists.
    _b._dispatchable.__call__ = _b._dispatchable._call_if_any_backends_installed
    return name
