"""NetworkX-flavored API layer (reference wrapper-signature parity).

Mirrors the reference's algorithm wrappers (SURVEY.md §2.C): same
parameter names, same defaults, warn-and-ignore for parameters the
engine does not support (the reference's pattern,
/root/reference/nx_neptune/algorithms/util/algorithm_utils.py:26-38),
and NetworkX-native return shapes (dict / dict_values / generators)
via the to_*_result adapters.

The heavy lifting stays in operators/*; this module only adapts
signatures and result shapes, exactly like the reference's thin
wrappers over remote calls.
"""

from __future__ import annotations

import warnings
from typing import Any, Iterable

from pyspark.sql import DataFrame

from .graph import LinkGraph


def _validate_mutate_config(graph: LinkGraph, write_property: str) -> str:
    """Mutate-variant guard, analog of the reference's
    validate_mutate_execution_config (nx_plugin/config.py:195-202 via
    algorithm_utils.py execute_mutation_query): the reference rejects
    configurations where the mutated state cannot persist; here the
    engine analog is rejecting property names that cannot become a
    vertex column (invalid identifier or a core-column collision)."""
    from .sources.tables import validate_sql_identifier

    validate_sql_identifier(write_property)
    if "." in write_property or write_property in ("vid", "name"):
        raise ValueError(
            f"write_property {write_property!r} would clobber a core vertex column"
        )
    return write_property


def _write_vertex_property(
    graph: LinkGraph, result: DataFrame, value_col: str, write_property: str
) -> dict:
    """Reference mutate-variant behavior (opencypher_builder.py mutate
    builders :804-984): persist scores as a vertex property and return
    {} instead of the scores."""
    _validate_mutate_config(graph, write_property)
    graph.vertices = graph.vertices.drop(write_property).join(
        result.withColumnRenamed(value_col, write_property), "vid", "left"
    )
    return {}


def _warn_unsupported(algo: str, **params: Any) -> None:
    """Reference behavior for unsupported params (algorithm_utils.py:26-38)."""
    for name, value in params.items():
        if value is not None:
            warnings.warn(
                f"Parameter `{name}` is not supported by {algo} and will be ignored.",
                stacklevel=3,
            )


def pagerank(
    graph: LinkGraph,
    alpha: float = 0.85,
    personalization: dict | None = None,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    nstart: dict | None = None,
    weight: str | None = "weight",
    dangling: dict | None = None,
    vertex_label: str | None = None,
    edge_labels: list | None = None,
    concurrency: int | None = None,
    traversal_direction: str | None = None,
    write_property: str | None = None,
) -> dict:
    """NetworkX-shaped pagerank: returns {node_name: rank}.

    traversal_direction: "outbound" (default) or "inbound"
    (reference pagerank.py:63,86,125-126) -- inbound runs the power
    iteration over the reversed edge set.

    Signature parity: /root/reference/nx_neptune/algorithms/link_analysis/
    pagerank.py:50-194. Unlike the reference (which warns-and-ignores
    nstart/dangling, pagerank.py:164-170), this engine supports them,
    since NetworkX is the correctness oracle. vertex_label/edge_labels/
    concurrency are remote-engine knobs with no local meaning.
    """
    from .operators.pagerank import pagerank as _pr

    _warn_unsupported(
        "pagerank",
        vertex_label=vertex_label,
        edge_labels=edge_labels,
        concurrency=concurrency,
    )
    name_of = graph.name_of()
    vid_of = {v: k for k, v in name_of.items()}

    def to_vids(d: dict | None) -> dict | None:
        if d is None:
            return None
        return {vid_of[str(k)]: v for k, v in d.items()}

    if traversal_direction not in (None, "outbound", "inbound"):
        raise ValueError(
            f"traversal_direction must be 'outbound' or 'inbound', got {traversal_direction!r}"
        )
    run_graph = graph
    if traversal_direction == "inbound" and graph.directed:
        run_graph = LinkGraph(
            graph.reversed_edges(),
            graph.vertices,
            directed=True,
            vids_non_negative=graph.vids_non_negative,
        )
    result = _pr(
        run_graph,
        alpha=alpha,
        personalization=to_vids(personalization),
        max_iter=max_iter,
        tol=tol,
        nstart=to_vids(nstart),
        weight=weight,
        dangling=to_vids(dangling),
    )
    if write_property is not None:
        return _write_vertex_property(graph, result, "rank", write_property)
    return {name_of[r["vid"]]: r["rank"] for r in result.collect()}


def hits(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-8,
    nstart: dict | None = None,
    normalized: bool = True,
    weight: str | None = None,
) -> tuple[dict, dict]:
    """NetworkX-shaped HITS: returns ({node: hub}, {node: authority}).

    No reference analog (Neptune Analytics ships no HITS; SURVEY §2.9
    extension class) — the signature follows ``nx.hits`` exactly, plus
    ``weight`` for weighted adjacency (nx uses adjacency weights via
    its sparse matrix; pass weight="weight" for that behavior).
    """
    from .operators.hits import hits as _hits

    name_of = graph.name_of()
    vid_of = {v: k for k, v in name_of.items()}
    ns = (
        {vid_of[str(k)]: v for k, v in nstart.items()} if nstart is not None else None
    )
    rows = _hits(
        graph,
        max_iter=max_iter,
        tol=tol,
        nstart=ns,
        normalized=normalized,
        weight=weight,
    ).collect()
    return (
        {name_of[r["vid"]]: r["hub"] for r in rows},
        {name_of[r["vid"]]: r["authority"] for r in rows},
    )


def degree_centrality(
    graph: LinkGraph,
    direction: str = "both",
    write_property: str | None = None,
    **ignored,
) -> dict:
    """{node: degree/(n-1)} (reference degree_centrality.py:41-194;
    mutate builder opencypher_builder.py:963-984)."""
    from .operators.degree import degree_centrality as _dc

    result = _dc(graph, direction=direction)
    if write_property is not None:
        return _write_vertex_property(graph, result, "centrality", write_property)
    name_of = graph.name_of()
    return {name_of[r["vid"]]: r["centrality"] for r in result.collect()}


def in_degree_centrality(graph: LinkGraph, **kw) -> dict:
    return degree_centrality(graph, direction="in", **kw)


def out_degree_centrality(graph: LinkGraph, **kw) -> dict:
    return degree_centrality(graph, direction="out", **kw)


def closeness_centrality(
    graph: LinkGraph,
    u: str | None = None,
    distance: str | None = None,
    wf_improved: bool = True,
    num_sources: int | None = None,
    write_property: str | None = None,
    **ignored,
) -> dict | float:
    """Reference closeness.py:44-129; `distance` unsupported there too
    (closeness.py:89); mutate builder opencypher_builder.py:908-933;
    single-source query form :860-905 (u= runs ONE BFS here, not
    all-sources-then-index)."""
    from .operators.closeness import MAX_INT64, closeness_centrality as _cc

    _warn_unsupported("closeness_centrality", distance=distance)
    if u is not None and write_property is None:
        # source-list fast path: one BFS from u only
        vid = graph.vid_of()[str(u)]
        rows = _cc(
            graph,
            wf_improved=wf_improved,
            num_sources=num_sources if num_sources is not None else MAX_INT64,
            sources=[vid],
        ).collect()
        return rows[0]["closeness"] if rows else 0.0
    result = _cc(
        graph,
        wf_improved=wf_improved,
        num_sources=num_sources if num_sources is not None else MAX_INT64,
    )
    if write_property is not None:
        return _write_vertex_property(graph, result, "closeness", write_property)
    name_of = graph.name_of()
    res = {name_of[r["vid"]]: r["closeness"] for r in result.collect()}
    if u is not None:
        return res[str(u)]
    return res


def label_propagation_communities(
    graph: LinkGraph,
    max_iterations: int = 20,
    weight: str | None = None,
    seed=None,
    write_property: str | None = None,
    **ignored,
) -> Iterable[set]:
    """dict_values-of-sets shape (reference label_propagation.py:356-362);
    `seed` ignored exactly like the reference (:103,176); mutate builder
    opencypher_builder.py:832-857."""
    from .operators.label_propagation import label_propagation as _lpa

    _warn_unsupported("label_propagation_communities", seed=seed)
    labels = _lpa(graph, max_iterations=max_iterations, weight=weight)
    if write_property is not None:
        _write_vertex_property(graph, labels, "label", write_property)
        return {}.values()
    name_of = graph.name_of()
    comms: dict[int, set] = {}
    for r in labels.collect():
        comms.setdefault(r["label"], set()).add(name_of[r["vid"]])
    return comms.values()


asyn_lpa_communities = label_propagation_communities
fast_label_propagation_communities = label_propagation_communities


def louvain_communities(
    graph: LinkGraph,
    weight: str | None = "weight",
    resolution: float | None = None,
    threshold: float | None = None,
    max_level: int | None = None,
    seed=None,
    max_iterations: int = 10,
    level_tolerance: float | None = None,
    write_property: str | None = None,
    **ignored,
) -> list[set]:
    """list-of-sets shape (reference louvain.py:46-148: threshold ->
    iterationTolerance louvain.py:101-102, level_tolerance ->
    levelTolerance :113-118, max_level -> maxLevels, write_property
    mutate builder opencypher_builder.py:804-829). The reference
    warns-unsupported for `resolution`/`seed` (louvain.py:96 — a
    Neptune Analytics limitation); this engine supports `resolution`
    natively (generalized-modularity γ, operators/louvain.py) and only
    `seed` keeps the warn-and-ignore parity (the parallel variant is
    deterministic, no RNG to seed)."""
    from .operators.louvain import louvain_communities as _lv

    _warn_unsupported("louvain_communities", seed=seed)
    result = _lv(
        graph,
        weight=weight,
        max_levels=max_level if max_level is not None else 5,
        max_iterations=max_iterations,
        iteration_tolerance=threshold if threshold is not None else 0.0,
        level_tolerance=level_tolerance if level_tolerance is not None else 0.0,
        resolution=resolution if resolution is not None else 1.0,
    )
    if write_property is not None:
        _write_vertex_property(graph, result, "community", write_property)
        return []
    name_of = graph.name_of()
    comms: dict[int, set] = {}
    for r in result.collect():
        comms.setdefault(r["community"], set()).add(name_of[r["vid"]])
    return list(comms.values())


def modularity(
    graph: LinkGraph,
    communities,
    weight: str | None = "weight",
    resolution: float = 1.0,
    **ignored,
) -> float:
    """NetworkX-shaped modularity: ``communities`` is an iterable of
    node collections forming a partition of the graph (non-partitions
    raise, nx.community.modularity parity); returns the scalar Q from
    the distributed operator (operators/modularity.py)."""
    from .operators.modularity import modularity as _mod

    graph._guard_adapter("modularity")
    vid_of = graph.vid_of()
    comms = [set(c) for c in communities]
    seen: set = set()
    for c in comms:
        for node in c:
            key = str(node)
            if key not in vid_of or key in seen:
                raise ValueError(
                    f"`communities` is not a partition of G ({node!r})"
                )
            seen.add(key)
    if len(seen) != len(vid_of):
        raise ValueError("`communities` is not a partition of G (nodes missing)")
    rows = [
        (vid_of[str(node)], ci) for ci, c in enumerate(comms) for node in c
    ]
    cdf = graph.spark.createDataFrame(rows, "vid long, community long")
    return _mod(graph, cdf, weight=weight, resolution=resolution)


def connected_components(graph: LinkGraph) -> Iterable[set]:
    """Generator of sets, NetworkX shape."""
    from .operators.components import connected_components as _cc

    name_of = graph.name_of()
    comps: dict[int, set] = {}
    for r in _cc(graph).collect():
        comps.setdefault(r["component"], set()).add(name_of[r["vid"]])
    return iter(comps.values())


def strongly_connected_components(graph: LinkGraph) -> Iterable[set]:
    """Generator of sets, NetworkX shape (directed)."""
    from .operators.scc import strongly_connected_components as _scc

    name_of = graph.name_of()
    comps: dict[int, set] = {}
    for r in _scc(graph).collect():
        comps.setdefault(r["scc_id"], set()).add(name_of[r["vid"]])
    return iter(comps.values())


def number_strongly_connected_components(graph: LinkGraph) -> int:
    from .operators.scc import number_strongly_connected_components as _n

    return _n(graph)


def weakly_connected_components(graph: LinkGraph) -> Iterable[set]:
    """``nx.weakly_connected_components``: components of the
    undirected view — exactly what operators/components.py computes."""
    return connected_components(graph)


def number_connected_components(graph: LinkGraph) -> int:
    from .operators.components import connected_components as _cc

    return _cc(graph).select("component").distinct().count()


def number_weakly_connected_components(graph: LinkGraph) -> int:
    return number_connected_components(graph)


def _nonempty_or_raise(graph: LinkGraph, what: str) -> None:
    if graph.vertices.limit(1).isEmpty():
        raise ValueError(f"Connectivity is undefined for the null graph. ({what})")


def is_connected(graph: LinkGraph) -> bool:
    _nonempty_or_raise(graph, "is_connected")
    return number_connected_components(graph) == 1


def is_weakly_connected(graph: LinkGraph) -> bool:
    _nonempty_or_raise(graph, "is_weakly_connected")
    return number_weakly_connected_components(graph) == 1


def is_strongly_connected(graph: LinkGraph) -> bool:
    _nonempty_or_raise(graph, "is_strongly_connected")
    return number_strongly_connected_components(graph) == 1


def attracting_components(graph: LinkGraph) -> Iterable[set]:
    """Generator of sets, NetworkX shape: SCCs with no out-edge in
    the condensation."""
    from .operators.condensation import attracting_components as _ac

    name_of = graph.name_of()
    comps: dict[int, set] = {}
    for r in _ac(graph).collect():
        comps.setdefault(r["scc_id"], set()).add(name_of[r["vid"]])
    return iter(comps.values())


def number_attracting_components(graph: LinkGraph) -> int:
    from .operators.condensation import attracting_components as _ac

    return _ac(graph).select("scc_id").distinct().count()


def topological_generations(graph: LinkGraph) -> Iterable[list]:
    """Generator of generations (lists sorted by name), nx shape."""
    from .operators.toposort import topological_generations as _tg

    name_of = graph.name_of()
    gens: dict[int, list] = {}
    for r in _tg(graph).collect():
        gens.setdefault(r["generation"], []).append(name_of[r["vid"]])
    return iter([sorted(gens[g]) for g in sorted(gens)])


def topological_sort(graph: LinkGraph) -> Iterable:
    """Flat deterministic topological order (generation, then name)."""
    for gen in topological_generations(graph):
        yield from gen


def degree_assortativity_coefficient(
    graph: LinkGraph, x: str = "out", y: str = "in", weight=None, nodes=None
) -> float:
    """``nx.degree_assortativity_coefficient`` (weighted form uses
    strengths with edge-weight sample multiplicity)."""
    if nodes is not None:
        raise NotImplementedError("node-restricted assortativity is not implemented")
    from .operators.assortativity import (
        degree_assortativity_coefficient as _dac,
    )

    return _dac(graph, x=x, y=y, weight=weight)


def average_degree_connectivity(
    graph: LinkGraph,
    source: str = "in+out",
    target: str = "in+out",
    nodes=None,
    weight=None,
    **ignored,
) -> dict:
    """``nx.average_degree_connectivity`` shape (weighted = Barrat
    strength normalization)."""
    if nodes is not None:
        raise NotImplementedError("node-restricted connectivity is not implemented")
    from .operators.assortativity import average_degree_connectivity as _adc

    rows = _adc(graph, source=source, target=target, weight=weight).collect()
    if weight is not None:
        return {r["degree"]: r["avg_nbr_degree"] for r in rows}
    # nx reports a zero-norm class (k=0) as the raw int sum
    return {
        r["degree"]: (0 if r["degree"] == 0 else r["avg_nbr_degree"]) for r in rows
    }


def average_neighbor_degree(
    graph: LinkGraph,
    source: str = "out",
    target: str = "out",
    nodes=None,
    weight=None,
    **ignored,
) -> dict:
    """``nx.average_neighbor_degree`` shape."""
    if nodes is not None:
        raise NotImplementedError("node-restricted form is not implemented")
    from .operators.assortativity import average_neighbor_degree as _and

    name_of = graph.name_of()
    return {
        name_of[r["vid"]]: r["avg_nbr_degree"]
        for r in _and(graph, source=source, target=target, weight=weight).collect()
    }


def condensation(graph: LinkGraph) -> tuple[dict[int, set], set]:
    """(members: scc_id -> set of node names, comp_edges: set of
    (src_scc_id, dst_scc_id)) — the adapter-scale view of the SCC-DAG;
    the dispatch layer assembles NetworkX's 0..k-1-labeled DiGraph."""
    from .operators.condensation import condensation_with_members

    name_of = graph.name_of()
    cg, mapping = condensation_with_members(graph)
    members: dict[int, set] = {}
    for r in mapping.collect():
        members.setdefault(r["scc_id"], set()).add(name_of[r["vid"]])
    comp_edges = {(r["src"], r["dst"]) for r in cg.edges.collect()}
    return members, comp_edges


def _setop_adapter(what: str, fn, g1: LinkGraph, g2: LinkGraph):
    """(node_names, edge_name_pairs) view of a distributed set-op
    result — adapter-scale collect, guarded like every NetworkX-dict
    adapter. The dispatch layer maps names back to caller node
    objects and assembles the nx graph."""
    res = fn(g1, g2)
    res._guard_adapter(what)
    vrows = res.vertices.collect()
    name_of = {r["vid"]: r["name"] for r in vrows}
    nodes = [r["name"] for r in vrows]
    edges = [
        (name_of[r["src"]], name_of[r["dst"]]) for r in res.edges.collect()
    ]
    return nodes, edges


def compose(g1: LinkGraph, g2: LinkGraph, **ignored):
    """``nx.compose`` (topology; snapshot union). Returns
    (node_names, edge_name_pairs)."""
    from .operators.setops import compose as _op

    return _setop_adapter("compose", _op, g1, g2)


def intersection(g1: LinkGraph, g2: LinkGraph, **ignored):
    """``nx.intersection``: common nodes + common edges."""
    from .operators.setops import intersection as _op

    return _setop_adapter("intersection", _op, g1, g2)


def difference(g1: LinkGraph, g2: LinkGraph, **ignored):
    """``nx.difference``: g1 edges absent from g2 (equal node sets
    required; ValueError otherwise, nx-shaped by the dispatcher)."""
    from .operators.setops import difference as _op

    return _setop_adapter("difference", _op, g1, g2)


def symmetric_difference(g1: LinkGraph, g2: LinkGraph, **ignored):
    """``nx.symmetric_difference``: the crawl-diff primitive — edges
    in exactly one snapshot."""
    from .operators.setops import symmetric_difference as _op

    return _setop_adapter("symmetric_difference", _op, g1, g2)


def triangles(graph: LinkGraph, nodes=None) -> dict:
    from .operators.triangles import triangle_count as _tc

    name_of = graph.name_of()
    res = {name_of[r["vid"]]: r["triangles"] for r in _tc(graph).collect()}
    if nodes is not None:
        return {str(n): res[str(n)] for n in nodes}
    return res


def clustering(graph: LinkGraph, nodes=None, weight: str | None = None,
               **ignored) -> dict | float:
    """``nx.clustering`` shape (dict, or scalar for a single node);
    `weight` warn-and-ignored (reference unsupported-param pattern,
    algorithm_utils.py:26-38 — the operator is unweighted)."""
    from .operators.clustering import clustering as _cl
    from .operators.clustering import directed_clustering as _dcl

    _warn_unsupported("clustering", weight=weight)
    name_of = graph.name_of()
    op = _dcl if graph.directed else _cl
    res = {name_of[r["vid"]]: r["clustering"] for r in op(graph).collect()}
    if nodes is None:
        return res
    if isinstance(nodes, (str, int)) or not isinstance(nodes, Iterable):
        return res[str(nodes)]
    return {str(n): res[str(n)] for n in nodes}


def square_clustering(graph: LinkGraph, nodes=None) -> dict | float:
    """``nx.square_clustering`` shape (dict, or scalar for one node)."""
    from .operators.squares import square_clustering as _sq

    name_of = graph.name_of()
    res = {name_of[r["vid"]]: r["square_clustering"] for r in _sq(graph).collect()}
    if nodes is None:
        return res
    if isinstance(nodes, (str, int)) or not isinstance(nodes, Iterable):
        return res[str(nodes)]
    return {str(n): res[str(n)] for n in nodes}


def transitivity(graph: LinkGraph, **ignored) -> float:
    from .operators.clustering import transitivity as _tr

    return _tr(graph)


def average_clustering(graph: LinkGraph, nodes=None, weight: str | None = None,
                       count_zeros: bool = True, **ignored) -> float:
    from .operators.clustering import average_clustering as _ac
    from .operators.clustering import directed_clustering as _dcl
    from pyspark.sql import functions as F

    _warn_unsupported("average_clustering", weight=weight, nodes=nodes)
    if graph.directed:
        c = _dcl(graph)
        if not count_zeros:
            c = c.where(F.col("clustering") > 0)
        row = c.agg(F.avg("clustering").alias("m")).first()
        return float(row["m"]) if row["m"] is not None else 0.0
    return _ac(graph, count_zeros=count_zeros)


def s_metric(graph: LinkGraph, **ignored) -> float:
    """``nx.s_metric`` shape (float)."""
    from .operators.structure import s_metric as _sm

    return _sm(graph)


def global_efficiency(graph: LinkGraph) -> float:
    """``nx.global_efficiency`` shape (float; undirected only)."""
    from .operators.structure import global_efficiency as _ge

    return _ge(graph)


def rich_club_coefficient(
    graph: LinkGraph, normalized: bool = True, Q: float = 100, seed=None
) -> dict:
    """``nx.rich_club_coefficient`` shape: {k: phi}. nx's default
    ``normalized=True`` needs the sequential double-edge-swap null
    model — NotImplementedError here; pass normalized=False."""
    from .operators.structure import rich_club_coefficient as _rc

    rows = _rc(graph, normalized=normalized).collect()
    return {int(r["k"]): float(r["phi"]) for r in rows}


def effective_size(graph: LinkGraph, nodes=None, weight=None) -> dict:
    """``nx.effective_size`` shape: {node: e(u)} with NaN for
    isolates (unweighted undirected form only)."""
    if weight is not None:
        raise NotImplementedError(
            "weighted effective size (general mutual-weight formula) is "
            "not implemented"
        )
    from .operators.structure import effective_size as _es

    vids = None
    if nodes is not None:
        vid_of = graph.vid_of()
        vids = [vid_of[str(n)] for n in nodes]
    name_of = graph.name_of()
    return {
        name_of[r["vid"]]: (
            float("nan") if r["effective_size"] is None else r["effective_size"]
        )
        for r in _es(graph, nodes=vids).collect()
    }


def isolates(graph: LinkGraph) -> Iterable:
    """``nx.isolates`` shape (iterator of nodes)."""
    from .operators.structure import isolates as _iso

    name_of = graph.name_of()
    return iter(sorted(name_of[r["vid"]] for r in _iso(graph).collect()))


def number_of_isolates(graph: LinkGraph) -> int:
    from .operators.structure import number_of_isolates as _niso

    return _niso(graph)


def bipartite_color(graph: LinkGraph) -> dict:
    """``nx.bipartite.color`` shape: {node: 1|0}. Proper-2-coloring
    parity with root = min vid per component (see
    operators/bipartite.py for the nx-ordering caveat); raises
    ValueError on non-bipartite input where nx raises NetworkXError."""
    from .operators.bipartite import bipartite_color as _bc

    name_of = graph.name_of()
    return {name_of[r["vid"]]: int(r["color"]) for r in _bc(graph).collect()}


def is_bipartite(graph: LinkGraph) -> bool:
    from .operators.bipartite import is_bipartite as _ib

    return _ib(graph)


def _no_weighted_distance(weight) -> None:
    if weight is not None:
        raise NotImplementedError(
            "weighted distance measures (all-sources Dijkstra) are not "
            "implemented; operators/sssp.py covers single-source weighted"
        )


def eccentricity(graph: LinkGraph, v=None, sp=None, weight=None) -> dict | int:
    """``nx.eccentricity`` shape: dict, or scalar for a single node."""
    _no_weighted_distance(weight)
    if sp is not None:
        raise NotImplementedError("precomputed sp is not supported")
    from .operators.distance import eccentricity as _ecc

    single = v is not None and isinstance(v, (str, int))
    vid_of = graph.vid_of()
    sources = None
    if v is not None:
        sources = (
            [vid_of[str(v)]] if single else [vid_of[str(x)] for x in v]
        )
    name_of = graph.name_of()
    res = {
        name_of[r["vid"]]: int(r["ecc"])
        for r in _ecc(graph, sources=sources).collect()
    }
    return res[str(v)] if single else res


def diameter(graph: LinkGraph, e=None, usebounds=False, weight=None) -> int:
    _no_weighted_distance(weight)
    _warn_unsupported("diameter", e=e, usebounds=usebounds or None)
    from .operators.distance import diameter as _d

    return _d(graph)


def radius(graph: LinkGraph, e=None, usebounds=False, weight=None) -> int:
    _no_weighted_distance(weight)
    _warn_unsupported("radius", e=e, usebounds=usebounds or None)
    from .operators.distance import radius as _r

    return _r(graph)


def center(graph: LinkGraph, e=None, usebounds=False, weight=None) -> list:
    _no_weighted_distance(weight)
    _warn_unsupported("center", e=e, usebounds=usebounds or None)
    from .operators.distance import center as _c

    name_of = graph.name_of()
    return sorted(name_of[r["vid"]] for r in _c(graph).collect())


def periphery(graph: LinkGraph, e=None, usebounds=False, weight=None) -> list:
    _no_weighted_distance(weight)
    _warn_unsupported("periphery", e=e, usebounds=usebounds or None)
    from .operators.distance import periphery as _p

    name_of = graph.name_of()
    return sorted(name_of[r["vid"]] for r in _p(graph).collect())


def barycenter(graph: LinkGraph, weight=None, attr=None, sp=None) -> list:
    _no_weighted_distance(weight)
    if attr is not None or sp is not None:
        raise NotImplementedError("barycenter attr/sp are not supported")
    from .operators.distance import barycenter as _b

    name_of = graph.name_of()
    return sorted(name_of[r["vid"]] for r in _b(graph).collect())


def wiener_index(graph: LinkGraph, weight=None) -> float:
    _no_weighted_distance(weight)
    from .operators.distance import wiener_index as _w

    return _w(graph)


def average_shortest_path_length(
    graph: LinkGraph, weight=None, method=None, **ignored
) -> float:
    """nx.average_shortest_path_length (weight=None parity; `method`
    selects among nx's shortest-path backends and is meaningless for
    the BFS profile, so it follows the warn-and-ignore pattern)."""
    _no_weighted_distance(weight)
    from .operators.distance import average_shortest_path_length as _a

    return _a(graph)


def local_reaching_centrality(
    graph: LinkGraph, v, paths=None, weight=None, normalized=True
) -> float:
    """``nx.local_reaching_centrality`` shape (unweighted form)."""
    _no_weighted_distance(weight)
    if paths is not None:
        raise NotImplementedError("precomputed paths are not supported")
    from .operators.distance import local_reaching_centrality as _lrc

    return _lrc(graph, graph.vid_of()[str(v)])


def global_reaching_centrality(
    graph: LinkGraph, weight=None, normalized=True
) -> float:
    """``nx.global_reaching_centrality`` shape (unweighted form)."""
    _no_weighted_distance(weight)
    from .operators.distance import global_reaching_centrality as _grc

    return _grc(graph)


def laplacian_centrality(
    graph: LinkGraph,
    normalized: bool = True,
    nodelist=None,
    walk_type=None,
    alpha: float = 0.95,
    weight: str | None = "weight",
) -> dict:
    """``nx.laplacian_centrality`` shape: {node: centrality}."""
    from .operators.laplacian import laplacian_centrality as _lap

    name_of = graph.name_of()
    res = {
        name_of[r["vid"]]: r["laplacian"]
        for r in _lap(graph, normalized=normalized, weight=weight).collect()
    }
    if nodelist is not None:
        return {str(n): res[str(n)] for n in nodelist}
    return res


def is_tree(graph: LinkGraph) -> bool:
    from .operators.trees import is_tree as _f

    return _f(graph)


def is_forest(graph: LinkGraph) -> bool:
    from .operators.trees import is_forest as _f

    return _f(graph)


def is_branching(graph: LinkGraph) -> bool:
    from .operators.trees import is_branching as _f

    return _f(graph)


def is_arborescence(graph: LinkGraph) -> bool:
    from .operators.trees import is_arborescence as _f

    return _f(graph)


def _labels_df(graph: LinkGraph, labels: dict) -> DataFrame:
    vid_of = graph.vid_of()
    return graph.spark.createDataFrame(
        [(vid_of[str(n)], str(v)) for n, v in labels.items()],
        "vid long, label string",
    )


def harmonic_function(
    graph: LinkGraph, labels: dict, max_iter: int = 30, weight=None
) -> dict:
    """``nx.node_classification.harmonic_function`` shape:
    {node: predicted_label}; ``labels`` = {node: seed_label}."""
    from .operators.nodeclass import harmonic_function as _hf

    name_of = graph.name_of()
    out = _hf(graph, _labels_df(graph, labels), max_iter=max_iter, weight=weight)
    return {name_of[r["vid"]]: r["label"] for r in out.collect()}


def local_and_global_consistency(
    graph: LinkGraph,
    labels: dict,
    alpha: float = 0.99,
    max_iter: int = 30,
    weight=None,
) -> dict:
    """``nx.node_classification.local_and_global_consistency`` shape."""
    from .operators.nodeclass import local_and_global_consistency as _lgc

    name_of = graph.name_of()
    out = _lgc(
        graph,
        _labels_df(graph, labels),
        alpha=alpha,
        max_iter=max_iter,
        weight=weight,
    )
    return {name_of[r["vid"]]: r["label"] for r in out.collect()}


def trophic_levels(graph: LinkGraph, weight="weight", **kw) -> dict:
    """``nx.trophic_levels`` shape: {node: level}."""
    from .operators.trophic import trophic_levels as _tl

    name_of = graph.name_of()
    return {
        name_of[r["vid"]]: r["level"]
        for r in _tl(graph, weight=weight, **kw).collect()
    }


def trophic_differences(graph: LinkGraph, weight="weight", **kw) -> dict:
    """``nx.trophic_differences`` shape: {(u, v): diff}."""
    from .operators.trophic import trophic_differences as _td

    name_of = graph.name_of()
    return {
        (name_of[r["src"]], name_of[r["dst"]]): r["diff"]
        for r in _td(graph, weight=weight, **kw).collect()
    }


def trophic_incoherence_parameter(
    graph: LinkGraph, weight="weight", cannibalism: bool = False, **kw
) -> float:
    from .operators.trophic import trophic_incoherence_parameter as _tip

    return _tip(graph, weight=weight, cannibalism=cannibalism, **kw)


def partition_quality(graph: LinkGraph, partition) -> tuple[float, float]:
    """``nx.community.partition_quality`` shape: (coverage,
    performance). ``partition`` = iterable of node collections."""
    from .operators.quality import partition_quality as _pq

    vid_of = graph.vid_of()
    rows = [
        (vid_of[str(n)], i)
        for i, comm in enumerate(partition)
        for n in comm
    ]
    a = graph.spark.createDataFrame(rows, "vid long, community long")
    return _pq(graph, a)


def constraint(graph: LinkGraph, nodes=None, weight=None) -> dict:
    """``nx.constraint`` shape: {node: c(u)}, NaN for isolates."""
    from .operators.holes import constraint as _c

    name_of = graph.name_of()
    res = {
        name_of[r["vid"]]: (
            float("nan") if r["constraint"] is None else r["constraint"]
        )
        for r in _c(graph, weight=weight).collect()
    }
    if nodes is not None:
        return {str(n): res[str(n)] for n in nodes}
    return res


def local_constraint(graph: LinkGraph, u, v, weight=None) -> float:
    """``nx.local_constraint`` shape (scalar for one ordered pair)."""
    from .operators.holes import local_constraints as _lc

    vid_of = graph.vid_of()
    uu, vv = vid_of[str(u)], vid_of[str(v)]
    from pyspark.sql import functions as F  # noqa: PLC0415

    row = (
        _lc(graph, weight=weight)
        .where((F.col("u") == uu) & (F.col("v") == vv))
        .first()
    )
    return float(row["local_constraint"]) if row is not None else 0.0


def _vids_of(graph: LinkGraph, nodes) -> list[int]:
    vid_of = graph.vid_of()
    return [vid_of[str(n)] for n in nodes]


def cut_size(graph: LinkGraph, S, T=None, weight=None) -> float:
    from .operators import cuts

    return cuts.cut_size(
        graph, _vids_of(graph, S), None if T is None else _vids_of(graph, T),
        weight=weight,
    )


def volume(graph: LinkGraph, S, weight=None) -> float:
    from .operators import cuts

    return cuts.volume(graph, _vids_of(graph, S), weight=weight)


def conductance(graph: LinkGraph, S, T=None, weight=None) -> float:
    from .operators import cuts

    return cuts.conductance(
        graph, _vids_of(graph, S), None if T is None else _vids_of(graph, T),
        weight=weight,
    )


def normalized_cut_size(graph: LinkGraph, S, T=None, weight=None) -> float:
    from .operators import cuts

    return cuts.normalized_cut_size(
        graph, _vids_of(graph, S), None if T is None else _vids_of(graph, T),
        weight=weight,
    )


def edge_expansion(graph: LinkGraph, S, T=None, weight=None) -> float:
    from .operators import cuts

    return cuts.edge_expansion(
        graph, _vids_of(graph, S), None if T is None else _vids_of(graph, T),
        weight=weight,
    )


def mixing_expansion(graph: LinkGraph, S, T=None, weight=None) -> float:
    from .operators import cuts

    return cuts.mixing_expansion(
        graph, _vids_of(graph, S), None if T is None else _vids_of(graph, T),
        weight=weight,
    )


def node_expansion(graph: LinkGraph, S) -> float:
    from .operators import cuts

    return cuts.node_expansion(graph, _vids_of(graph, S))


def boundary_expansion(graph: LinkGraph, S) -> float:
    from .operators import cuts

    return cuts.boundary_expansion(graph, _vids_of(graph, S))


def node_boundary(graph: LinkGraph, nbunch1, nbunch2=None) -> set:
    from .operators import cuts

    name_of = graph.name_of()
    bdy = cuts.node_boundary(
        graph,
        _vids_of(graph, nbunch1),
        None if nbunch2 is None else _vids_of(graph, nbunch2),
    )
    return {name_of[r["vid"]] for r in bdy.collect()}


def edge_boundary(graph: LinkGraph, nbunch1, nbunch2=None) -> list:
    from .operators import cuts

    name_of = graph.name_of()
    rows = cuts.edge_boundary(
        graph,
        _vids_of(graph, nbunch1),
        None if nbunch2 is None else _vids_of(graph, nbunch2),
    ).collect()
    return [(name_of[r["src"]], name_of[r["dst"]]) for r in rows]


def voterank(graph: LinkGraph, number_of_nodes: int | None = None) -> list:
    """``nx.voterank`` shape: ordered list of elected seed nodes."""
    from .operators.voterank import voterank as _vr

    name_of = graph.name_of()
    rows = _vr(graph, number_of_nodes=number_of_nodes).collect()
    return [name_of[r["vid"]] for r in sorted(rows, key=lambda r: r["rank"])]


def triadic_census(graph: LinkGraph, nodelist=None) -> dict:
    """``nx.triadic_census`` shape: {triad_name: count}, all 16
    classes, nx key order. ``nodelist`` is not implemented (the
    subset-census bookkeeping is a different operator)."""
    if nodelist is not None:
        raise NotImplementedError("triadic_census nodelist is not implemented")
    from .operators.triads import TRIAD_NAMES, triadic_census as _tc

    got = {r["triad"]: int(r["count"]) for r in _tc(graph).collect()}
    return {nm: got[nm] for nm in TRIAD_NAMES}


def reciprocity(graph: LinkGraph, nodes=None) -> dict | float:
    """``nx.reciprocity`` shape: whole-graph scalar without `nodes`,
    scalar for a single node (raising NetworkXError for isolated
    nodes, nx parity), dict for an iterable."""
    from .operators.reciprocity import (
        overall_reciprocity as _orec,
        reciprocity as _rec,
    )

    if nodes is None:
        return _orec(graph)
    name_of = graph.name_of()
    res = {name_of[r["vid"]]: r["reciprocity"] for r in _rec(graph).collect()}
    single = isinstance(nodes, (str, int)) or not isinstance(nodes, Iterable)
    targets = [nodes] if single else list(nodes)
    out = {}
    for n in targets:
        v = res[str(n)]
        if v is None:
            import networkx as nx

            raise nx.NetworkXError("Not defined for isolated vertices.")
        out[str(n)] = v
    return out[str(targets[0])] if single else out


def overall_reciprocity(graph: LinkGraph, **ignored) -> float:
    from .operators.reciprocity import overall_reciprocity as _orec

    try:
        return _orec(graph)
    except ValueError:
        import networkx as nx

        raise nx.NetworkXError("Not defined for empty graphs")


def harmonic_centrality(graph: LinkGraph, nbunch=None, distance=None,
                        sources=None, **ignored) -> dict:
    """``nx.harmonic_centrality`` dict shape; `distance` (weighted
    paths) warn-and-ignored like the reference's closeness
    (closeness.py:89)."""
    from .operators.harmonic import harmonic_centrality as _hc

    _warn_unsupported("harmonic_centrality", distance=distance)
    vid_of = graph.vid_of()
    nb = [vid_of[str(v)] for v in nbunch] if nbunch is not None else None
    src = [vid_of[str(v)] for v in sources] if sources is not None else None
    name_of = graph.name_of()
    return {
        name_of[r["vid"]]: r["harmonic"]
        for r in _hc(graph, nbunch=nb, sources=src).collect()
    }


def bfs_edges(graph: LinkGraph, source: str, reverse: bool = False,
              depth_limit: int | None = None, sort_neighbors=None, **ignored):
    """Generator of (parent, child) pairs (reference bfs.py:41-130);
    `sort_neighbors` warn-and-ignored like the reference's explicit
    unsupported-param pattern (bfs.py:41, algorithm_utils.py:26-38)."""
    from .operators.bfs import bfs_parents as _bp

    _warn_unsupported("bfs_edges", sort_neighbors=sort_neighbors)

    vid_of = graph.vid_of()
    name_of = graph.name_of()
    rows = _bp(graph, vid_of[str(source)], depth_limit=depth_limit, reverse=reverse).collect()
    for r in sorted(rows, key=lambda r: (r["parent"], r["child"])):
        yield (name_of[r["parent"]], name_of[r["child"]])


def descendants_at_distance(graph: LinkGraph, source: str, distance: int, **ignored) -> set:
    from .operators.bfs import descendants_at_distance as _dd

    vid_of, name_of = graph.vid_of(), graph.name_of()
    return {name_of[r["vid"]] for r in _dd(graph, vid_of[str(source)], distance).collect()}


def descendants(graph: LinkGraph, source: str, **ignored) -> set:
    """``nx.descendants``: everything reachable from source."""
    from .operators.bfs import descendants as _d

    vid_of, name_of = graph.vid_of(), graph.name_of()
    if str(source) not in vid_of:
        raise ValueError(f"The node {source} is not in the graph.")
    return {name_of[r["vid"]] for r in _d(graph, vid_of[str(source)]).collect()}


def ancestors(graph: LinkGraph, source: str, **ignored) -> set:
    """``nx.ancestors``: everything that reaches source."""
    from .operators.bfs import ancestors as _a

    vid_of, name_of = graph.vid_of(), graph.name_of()
    if str(source) not in vid_of:
        raise ValueError(f"The node {source} is not in the graph.")
    return {name_of[r["vid"]] for r in _a(graph, vid_of[str(source)]).collect()}


def bfs_layers(graph: LinkGraph, sources, **ignored):
    """Generator of per-level node-name lists (reference bfs.py:188-236)."""
    from .operators.bfs import bfs_layers as _bl

    if isinstance(sources, str):
        sources = [sources]
    vid_of, name_of = graph.vid_of(), graph.name_of()
    rows = _bl(graph, [vid_of[str(s)] for s in sources]).collect()
    for r in rows:
        yield [name_of[m] for m in r["members"]]


def has_path(graph: LinkGraph, source, target, **ignored) -> bool:
    """``nx.has_path``: early-exit BFS reachability probe."""
    from .operators.bfs import has_path as _hp

    vid_of = graph.vid_of()
    for n, role in ((source, "Source"), (target, "Target")):
        if str(n) not in vid_of:
            raise ValueError(f"{role} {n} is not in G")
    return _hp(graph, vid_of[str(source)], vid_of[str(target)])


def single_source_shortest_path_length(
    graph: LinkGraph, source, cutoff: int | None = None, **ignored
) -> dict:
    """``nx.single_source_shortest_path_length``: hop distances from
    source (source itself at 0), optionally depth-capped."""
    from .operators.bfs import bfs_levels

    vid_of, name_of = graph.vid_of(), graph.name_of()
    if str(source) not in vid_of:
        raise ValueError(f"Source {source} is not in G")
    rows = bfs_levels(graph, [vid_of[str(source)]], max_depth=cutoff).collect()
    return {name_of[r["vid"]]: r["level"] for r in rows}


def is_directed_acyclic_graph(graph: LinkGraph, **ignored) -> bool:
    """``nx.is_directed_acyclic_graph``: the bulk Kahn peel either
    exhausts the graph (DAG) or stalls on the cyclic remainder."""
    if not graph.directed:
        return False
    from .operators.toposort import topological_generations as _tg

    try:
        _tg(graph)
        return True
    except ValueError:
        return False


def dag_longest_path(
    graph: LinkGraph,
    weight: str = "weight",
    default_weight: float = 1,
    topo_order=None,
    **ignored,
) -> list:
    """``nx.dag_longest_path`` (node-name list; endpoint/predecessor
    ties break by vid — nx leaves them to dict order)."""
    from .operators.dagpath import dag_longest_path as _dlp

    _warn_unsupported("dag_longest_path", topo_order=topo_order)
    if not graph.directed:
        raise ValueError("dag_longest_path requires a directed graph")
    name_of = graph.name_of()
    return [name_of[v] for v in _dlp(graph, weight, default_weight)]


def dag_longest_path_length(
    graph: LinkGraph, weight: str = "weight", default_weight: float = 1, **ignored
):
    """``nx.dag_longest_path_length``: total weight of the critical
    path (int when integral, matching nx's sum-of-ints shape)."""
    from .operators.dagpath import dag_longest_path_length as _dlpl

    if not graph.directed:
        raise ValueError("dag_longest_path_length requires a directed graph")
    val = _dlpl(graph, weight, default_weight)
    return int(val) if float(val).is_integer() else val


def eigenvector_centrality(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-06,
    nstart: dict | None = None,
    weight: str | None = None,
    **ignored,
) -> dict:
    """NetworkX-shaped eigenvector centrality (nx signature; no
    reference analog — SURVEY §2.9 extension class)."""
    from .operators.eigenvector import eigenvector_centrality as _ec

    name_of = graph.name_of()
    vid_of = {v: k for k, v in name_of.items()}
    ns = (
        {vid_of[str(k)]: v for k, v in nstart.items()} if nstart is not None else None
    )
    rows = _ec(graph, max_iter=max_iter, tol=tol, nstart=ns, weight=weight).collect()
    return {name_of[r["vid"]]: r["centrality"] for r in rows}


def katz_centrality(
    graph: LinkGraph,
    alpha: float = 0.1,
    beta: float | dict = 1.0,
    max_iter: int = 1000,
    tol: float = 1e-06,
    nstart: dict | None = None,
    normalized: bool = True,
    weight: str | None = None,
    **ignored,
) -> dict:
    """NetworkX-shaped Katz centrality (nx signature; no reference
    analog — SURVEY §2.9 extension class)."""
    from .operators.katz import katz_centrality as _kc

    name_of = graph.name_of()
    vid_of = {v: k for k, v in name_of.items()}
    ns = (
        {vid_of[str(k)]: v for k, v in nstart.items()} if nstart is not None else None
    )
    b = (
        {vid_of[str(k)]: v for k, v in beta.items()}
        if isinstance(beta, dict)
        else beta
    )
    rows = _kc(
        graph, alpha=alpha, beta=b, max_iter=max_iter, tol=tol,
        nstart=ns, normalized=normalized, weight=weight,
    ).collect()
    return {name_of[r["vid"]]: r["centrality"] for r in rows}


def core_number(graph: LinkGraph, **ignored) -> dict:
    """NetworkX-shaped core numbers (nx.core_number signature)."""
    from .operators.kcore import core_number as _cn

    name_of = graph.name_of()
    return {name_of[r["vid"]]: r["core"] for r in _cn(graph).collect()}


def k_core_nodes(graph: LinkGraph, k: int | None = None) -> set:
    """Node set of the k-core (None = main core); the subgraph shaping
    happens in the backend interface (nx.k_core returns a subgraph)."""
    from .operators.kcore import k_core as _kc

    name_of = graph.name_of()
    return {name_of[r["vid"]] for r in _kc(graph, k=k).collect()}


def k_truss_edges(graph: LinkGraph, k: int) -> set:
    """Truss edge set as frozenset name pairs; the subgraph shaping
    happens in the backend interface (nx.k_truss returns a graph)."""
    from .operators.ktruss import k_truss as _kt

    name_of = graph.name_of()
    return {
        frozenset((name_of[r["u"]], name_of[r["v"]]))
        for r in _kt(graph, k).collect()
    }


def maximal_independent_set(graph: LinkGraph, nodes=None, seed=None, **ignored) -> list:
    """nx.maximal_independent_set-shaped node list. ``nodes`` seeds the
    set (nx semantics: must exist and be pairwise non-adjacent; the
    result contains them). ``seed`` is accepted and ignored — this
    engine's randomness is a pinned portable hash, so the result is
    reproducible by construction (nx's is only reproducible per-seed)."""
    from pyspark.sql import functions as F

    from .operators.mis import maximal_independent_set as _mis

    name_of = graph.name_of()
    if not nodes:
        rows = _mis(graph).collect()
        return [name_of[r["vid"]] for r in rows]

    vid_of = graph.vid_of()
    missing = [n for n in nodes if str(n) not in vid_of]
    if missing:
        raise ValueError(f"{missing} is not a subset of the nodes of the graph")
    seed_vids = {vid_of[str(n)] for n in nodes}
    fwd = graph.edges.select("src", "dst")
    sym = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).where(F.col("src") != F.col("dst"))
    seed_df = graph.spark.createDataFrame(
        [(int(v),) for v in seed_vids], "vid long"
    )
    both_in = (
        sym.join(seed_df.withColumnRenamed("vid", "src"), "src", "left_semi")
        .join(seed_df.withColumnRenamed("vid", "dst"), "dst", "left_semi")
    )
    if not both_in.isEmpty():
        raise ValueError(f"{list(nodes)} is not an independent set of the graph")
    # retire the seeds and their neighbors, run Luby on the residual
    nbrs = sym.join(
        seed_df.withColumnRenamed("vid", "src"), "src", "left_semi"
    ).select(F.col("dst").alias("vid"))
    gone = seed_df.unionByName(nbrs).distinct()
    residual_edges = (
        fwd.join(gone.withColumnRenamed("vid", "src"), "src", "left_anti")
        .join(gone.withColumnRenamed("vid", "dst"), "dst", "left_anti")
    )
    residual_verts = graph.vertices.select("vid").join(gone, "vid", "left_anti")
    residual = LinkGraph(residual_edges, residual_verts, directed=graph.directed)
    rows = _mis(residual).collect()
    return [name_of[v] for v in sorted(seed_vids)] + [
        name_of[r["vid"]] for r in rows
    ]


def maximal_matching(graph: LinkGraph, **ignored) -> set:
    """nx.maximal_matching-shaped edge set. nx's first-seen sweep is
    order-dependent; this is the deterministic local-dominant matching
    (same contract: a maximal matching of the same graph)."""
    from .operators.matching import maximal_matching as _mm

    name_of = graph.name_of()
    return {
        (name_of[r["u"]], name_of[r["v"]]) for r in _mm(graph).collect()
    }


def min_weighted_vertex_cover(graph: LinkGraph, weight=None, **ignored) -> set:
    """nx.approximation.min_weighted_vertex_cover contract (a cover at
    most 2x optimal) via the matched-endpoints cover (Gavril). Only the
    unweighted case — nx's local-ratio weighting needs a sequential
    reduction this engine does not replay."""
    if weight is not None:
        raise NotImplementedError(
            "weighted vertex cover is not implemented (unweighted 2-approx only)"
        )
    from .operators.matching import vertex_cover as _vc

    name_of = graph.name_of()
    return {name_of[r["vid"]] for r in _vc(graph).collect()}


def dominating_set(graph: LinkGraph, start_with=None, **ignored) -> set:
    """nx.dominating_set contract (any dominating set): a maximal
    independent set dominates every vertex, so this returns the Luby
    MIS — seeded with ``start_with`` when given, exactly nx's
    start_with semantics."""
    nodes = [start_with] if start_with is not None else None
    return set(maximal_independent_set(graph, nodes=nodes))


def greedy_color(graph: LinkGraph, strategy="largest_first", **ignored) -> dict:
    """nx.greedy_color-shaped {node: color}. The sequential visit
    order behind nx's strategies cannot be replayed distributively;
    this is the Jones-Plassmann coloring (deterministic, proper,
    palette ≤ Δ+1 — the same contract nx's greedy guarantees).
    ``strategy`` is accepted and ignored, the reference's
    warn-and-ignore pattern for order-dependent parameters."""
    from .operators.coloring import greedy_color as _gc

    name_of = graph.name_of()
    return {name_of[r["vid"]]: r["color"] for r in _gc(graph).collect()}


def single_source_dijkstra_path_length(
    graph: LinkGraph,
    source,
    cutoff: float | None = None,
    weight: str | None = "weight",
    **ignored,
) -> dict:
    """NetworkX-shaped weighted SSSP dict (reached nodes only)."""
    from .operators.sssp import shortest_path_lengths as _sp

    vid_of, name_of = graph.vid_of(), graph.name_of()
    rows = _sp(graph, vid_of[str(source)], weight=weight, check_every=4).collect()
    out = {name_of[r["vid"]]: r["distance"] for r in rows}
    if cutoff is not None:
        out = {k: v for k, v in out.items() if v <= cutoff}
    return out


def _linkpred_scores(graph: LinkGraph) -> dict:
    from .operators.linkpred import link_prediction as _lp

    graph._guard_adapter("link-prediction adapters")
    # include_existing_edges: an explicit ebunch may name adjacent
    # pairs, and NetworkX scores those too (the scores are functions of
    # neighbor sets, not of adjacency); ebunch=None filters to
    # non-edges itself, so the extra rows are never looked up there
    rows = _lp(graph, min_common=1, include_existing_edges=True).collect()
    out = {}
    for r in rows:
        u, v = r["u"], r["v"]
        out[(min(u, v), max(u, v))] = r
    return out


# explicit ebunches at or above this size skip the collected-dict path
# and score through a DataFrame join instead (VERDICT r4 item 8)
_EBUNCH_DISTRIBUTED_MIN = 10_000


def _linkpred_ebunch_distributed(graph: LinkGraph, pairs: list, field: str, default):
    """Distributed scorer for large explicit ebunches: the ebunch
    becomes a DataFrame joined against the link_prediction pair table
    (names resolved by joining the vertex dictionary, not by collected
    dicts), so only the |ebunch| result rows ever reach the driver and
    none of the fixture-scale ``_guard_adapter`` collects run. Yields
    in ebunch order (nx generator parity) via an index sort.
    ``field="pref_attachment_full"`` scores deg(u)·deg(v) for EVERY
    pair (PA is defined off the wedge support)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from .operators.linkpred import link_prediction as _lp

    spark = graph.spark
    eb = spark.createDataFrame(
        [(i, str(u), str(v)) for i, (u, v) in enumerate(pairs)],
        "idx long, un string, vn string",
    )
    vs = graph.vertices.select("vid", "name")
    keyed = (
        eb.join(vs.select(F.col("name").alias("un"), F.col("vid").alias("a")), "un")
        .join(vs.select(F.col("name").alias("vn"), F.col("vid").alias("b")), "vn")
        .select(
            "idx",
            "un",
            "vn",
            F.least("a", "b").alias("u"),
            F.greatest("a", "b").alias("v"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_resolved = keyed.count()
    if n_resolved != len(pairs):
        keyed.unpersist()
        raise KeyError(
            f"ebunch contains {len(pairs) - n_resolved} pair(s) naming "
            "nodes not in the graph"
        )
    if field == "pref_attachment_full":
        e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        sym = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        deg = sym.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
        scored = (
            keyed.join(
                deg.select(F.col("vid").alias("u"), F.col("deg").alias("du")),
                "u",
                "left",
            )
            .join(
                deg.select(F.col("vid").alias("v"), F.col("deg").alias("dv")),
                "v",
                "left",
            )
            .select(
                "idx",
                "un",
                "vn",
                (
                    F.coalesce("du", F.lit(0)) * F.coalesce("dv", F.lit(0))
                ).alias("score"),
            )
        )
    else:
        lp = _lp(graph, min_common=1, include_existing_edges=True).select(
            "u", "v", F.col(field).alias("score")
        )
        scored = keyed.join(lp, ["u", "v"], "left").select(
            "idx",
            "un",
            "vn",
            F.coalesce("score", F.lit(float(default))).alias("score"),
        )
    try:
        for r in scored.orderBy("idx").toLocalIterator():
            yield (r["un"], r["vn"], r["score"])
    finally:
        keyed.unpersist()


def _linkpred_iter(graph: LinkGraph, ebunch, field: str, default=0.0):
    """Shared ebunch adapter: NetworkX yields (u, v, score) for every
    requested pair; pairs outside the wedge support score ``default``.
    ebunch=None = all non-edges (nx default; fixture-scale only — the
    scalable path is operators.linkpred.link_prediction). Explicit
    ebunches of >= _EBUNCH_DISTRIBUTED_MIN pairs route through the
    DataFrame-join scorer and stay distributed."""
    if ebunch is not None:
        ebunch = list(ebunch)
        if len(ebunch) >= _EBUNCH_DISTRIBUTED_MIN:
            yield from _linkpred_ebunch_distributed(graph, ebunch, field, default)
            return
    scores = _linkpred_scores(graph)
    vid_of, name_of = graph.vid_of(), graph.name_of()
    if ebunch is None:
        import itertools

        vids = sorted(name_of)
        adj = set()
        e = graph.edges.select("src", "dst").collect()
        for r in e:
            a, b = r["src"], r["dst"]
            adj.add((min(a, b), max(a, b)))
        pairs = [
            p for p in itertools.combinations(vids, 2) if p not in adj
        ]
    else:
        pairs = []
        for u, v in ebunch:
            a, b = vid_of[str(u)], vid_of[str(v)]
            pairs.append((a, b))
    for a, b in pairs:
        key = (min(a, b), max(a, b))
        r = scores.get(key)
        yield (name_of[a], name_of[b], r[field] if r is not None else default)


def jaccard_coefficient(graph: LinkGraph, ebunch=None, **ignored):
    return _linkpred_iter(graph, ebunch, "jaccard", 0.0)


def adamic_adar_index(graph: LinkGraph, ebunch=None, **ignored):
    return _linkpred_iter(graph, ebunch, "adamic_adar", 0.0)


def resource_allocation_index(graph: LinkGraph, ebunch=None, **ignored):
    return _linkpred_iter(graph, ebunch, "resource_alloc", 0.0)


def preferential_attachment(graph: LinkGraph, ebunch=None, **ignored):
    """PA is degree-only (defined for every pair, not just the wedge
    support). Degrees come from the undirected simple projection —
    the same neighbor-set semantics the other link-prediction scores
    use (NetworkX marks these @not_implemented_for("directed"); we
    accept digraphs by projecting, like operators.linkpred)."""
    from pyspark.sql import functions as F

    if ebunch is not None:
        ebunch = list(ebunch)
        if len(ebunch) >= _EBUNCH_DISTRIBUTED_MIN:
            yield from _linkpred_ebunch_distributed(
                graph, ebunch, "pref_attachment_full", 0
            )
            return
    graph._guard_adapter("preferential_attachment")
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg_rows = sym.groupBy(F.col("src").alias("vid")).count().collect()
    deg = {r["vid"]: r["count"] for r in deg_rows}
    deg = {vid: deg.get(vid, 0) for vid in graph.name_of()}
    vid_of, name_of = graph.vid_of(), graph.name_of()
    if ebunch is None:
        import itertools

        adj = set()
        for r in graph.edges.select("src", "dst").collect():
            a, b = r["src"], r["dst"]
            adj.add((min(a, b), max(a, b)))
        pairs = [
            p for p in itertools.combinations(sorted(name_of), 2) if p not in adj
        ]
    else:
        pairs = [(vid_of[str(u)], vid_of[str(v)]) for u, v in ebunch]
    for a, b in pairs:
        yield (name_of[a], name_of[b], deg[a] * deg[b])


def _communities_df(graph: LinkGraph, communities: dict):
    """Map a {node name: community} dict to DataFrame(vid, community),
    raising on gaps (NetworkX raises NetworkXAlgorithmError when a node
    lacks the community attribute)."""
    import networkx as nx

    vid_of = graph.vid_of()
    by_name = {str(k): v for k, v in communities.items()}
    missing = set(vid_of) - set(by_name)
    if missing:
        raise nx.NetworkXAlgorithmError(
            f"No community information for node(s): {sorted(missing)[:5]}"
        )
    # only equality matters — encode arbitrary hashable community
    # labels as dense ints so the DataFrame column is a fixed type
    codes: dict = {}
    for v in by_name.values():
        codes.setdefault(v, len(codes))
    return graph.spark.createDataFrame(
        [(vid, codes[by_name[name]]) for name, vid in vid_of.items()],
        "vid long, community long",
    )


def _community_linkpred_iter(
    graph: LinkGraph, ebunch, communities: dict, field: str, delta: float = 0.001
):
    """Shared ebunch adapter for the Soundarajan–Hopcroft / WIC scores
    (the community analog of _linkpred_iter). Pairs outside the wedge
    support score 0 in all three measures (no common neighbors ⇒ no
    count, no bonus, empty W). ``communities`` maps node name →
    community (the interface layer extracts it from the nx node attr).
    Fixture-scale guarded: the scores collect into a dict; the
    distributed surface is operators.linkpred.link_prediction_community.
    """
    from .operators.linkpred import link_prediction_community as _lpc

    if communities is None:
        raise TypeError(
            "communities= (dict of node name -> community) is required; the "
            "nx backend wrapper extracts it from the graph's node attribute"
        )
    graph._guard_adapter("community link-prediction adapters")
    cdf = _communities_df(graph, communities)
    rows = _lpc(
        graph, cdf, delta=delta, include_existing_edges=True
    ).collect()
    scores = {}
    for r in rows:
        u, v = r["u"], r["v"]
        scores[(min(u, v), max(u, v))] = r
    vid_of, name_of = graph.vid_of(), graph.name_of()
    if ebunch is None:
        import itertools

        adj = set()
        for r in graph.edges.select("src", "dst").collect():
            a, b = r["src"], r["dst"]
            adj.add((min(a, b), max(a, b)))
        pairs = [
            p for p in itertools.combinations(sorted(name_of), 2) if p not in adj
        ]
    else:
        pairs = [(vid_of[str(u)], vid_of[str(v)]) for u, v in ebunch]
    zero = 0 if field == "cn_sh" else 0.0
    for a, b in pairs:
        r = scores.get((min(a, b), max(a, b)))
        yield (name_of[a], name_of[b], r[field] if r is not None else zero)


def cn_soundarajan_hopcroft(graph: LinkGraph, ebunch=None, communities=None, **ignored):
    """nx.cn_soundarajan_hopcroft: CN + same-community bonus (WWW'12)."""
    return _community_linkpred_iter(graph, ebunch, communities, "cn_sh")


def ra_index_soundarajan_hopcroft(
    graph: LinkGraph, ebunch=None, communities=None, **ignored
):
    """nx.ra_index_soundarajan_hopcroft: RA over same-community common
    neighbors only."""
    return _community_linkpred_iter(graph, ebunch, communities, "ra_sh")


def within_inter_cluster(
    graph: LinkGraph, ebunch=None, delta=0.001, communities=None, **ignored
):
    """nx.within_inter_cluster: |W| / (|I| + delta) split of the common
    neighbors by community (Valverde-Rebaza & Lopes SBIA'12)."""
    import networkx as nx

    if delta <= 0:
        raise nx.NetworkXAlgorithmError("Delta must be greater than zero")
    return _community_linkpred_iter(graph, ebunch, communities, "wic", delta=delta)


def common_neighbor_centrality(graph: LinkGraph, ebunch=None, alpha=0.8, **ignored):
    """nx.common_neighbor_centrality (CCPA): alpha·CN + (1-alpha)·N/d.

    Pairs in the wedge support have d ∈ {1, 2} and come straight from
    the distributed operator; pairs OUTSIDE it (no common neighbor)
    need a genuine shortest-path distance, which this fixture-scale
    adapter computes with a local BFS over the collected undirected
    adjacency — the distributed surface for the canonical candidate
    set (non-adjacent, ≥1 common neighbor, d=2 exactly) is
    operators.linkpred.link_prediction_community's ccpa column."""
    import networkx as nx

    from .operators.linkpred import link_prediction as _lp

    graph._guard_adapter("common_neighbor_centrality")
    alpha = float(alpha)
    rows = _lp(graph, min_common=1, include_existing_edges=True).collect()
    common = {}
    for r in rows:
        u, v = r["u"], r["v"]
        common[(min(u, v), max(u, v))] = r["common"]
    vid_of, name_of = graph.vid_of(), graph.name_of()
    n = len(name_of)
    nbrs: dict[int, set] = {vid: set() for vid in name_of}
    adj = set()
    for r in graph.edges.select("src", "dst").collect():
        a, b = r["src"], r["dst"]
        if a == b:
            continue
        nbrs[a].add(b)
        nbrs[b].add(a)
        adj.add((min(a, b), max(a, b)))
    if ebunch is None:
        import itertools

        pairs = [
            p for p in itertools.combinations(sorted(name_of), 2) if p not in adj
        ]
    else:
        pairs = [(vid_of[str(u)], vid_of[str(v)]) for u, v in ebunch]

    from collections import deque

    dist_cache: dict[int, dict[int, int]] = {}

    def _dist(a: int, b: int) -> float:
        if a not in dist_cache:
            d = {a: 0}
            q = deque([a])
            while q:
                x = q.popleft()
                for y in nbrs[x]:
                    if y not in d:
                        d[y] = d[x] + 1
                        q.append(y)
            dist_cache[a] = d
        return float(dist_cache[a].get(b, float("inf")))

    for a, b in pairs:
        if a == b:
            raise nx.NetworkXAlgorithmError("Self loops are not supported")
        key = (min(a, b), max(a, b))
        cn = common.get(key, 0)
        if alpha == 1:
            yield (name_of[a], name_of[b], cn)
            continue
        if key in adj:
            d = 1.0
        elif cn >= 1:
            d = 2.0
        else:
            d = _dist(a, b)
        yield (name_of[a], name_of[b], alpha * cn + (1 - alpha) * n / d)


def betweenness_centrality(
    graph: LinkGraph,
    k: int | None = None,
    normalized: bool = True,
    weight: str | None = None,
    endpoints: bool = False,
    seed=None,
    sources: list | None = None,
    **ignored,
) -> dict:
    """NetworkX-shaped betweenness (nx.betweenness_centrality
    signature). ``seed`` is warn-and-ignored (the reference's pattern
    for randomized semantics); ``k`` samples the k lowest-id pivots
    deterministically; ``sources`` (node names) overrides with an
    explicit pivot list."""
    from .operators.betweenness import betweenness_centrality as _bc

    if seed is not None:
        _warn_unsupported("betweenness_centrality", seed=seed)
    name_of = graph.name_of()
    vid_of = {v: kk for kk, v in name_of.items()}
    src_vids: list[int] | None
    if sources is not None:
        src_vids = [vid_of[str(s)] for s in sources]
    elif k is not None:
        src_vids = sorted(name_of)[: int(k)]
    else:
        src_vids = None
    rows = _bc(
        graph,
        sources=src_vids,
        normalized=normalized,
        weight=weight,
        endpoints=endpoints,
    ).collect()
    return {name_of[r["vid"]]: r["betweenness"] for r in rows}


def edge_betweenness_centrality(
    graph: LinkGraph,
    k: int | None = None,
    normalized: bool = True,
    weight: str | None = None,
    seed=None,
    sources: list | None = None,
    **ignored,
) -> dict:
    """NetworkX-shaped edge betweenness (nx.edge_betweenness_centrality
    signature): {(u, v): score} over every edge. ``seed`` is
    warn-and-ignored; ``k`` samples the k lowest-id pivots
    deterministically; ``sources`` overrides with explicit names."""
    from .operators.betweenness import edge_betweenness_centrality as _ebc

    if seed is not None:
        _warn_unsupported("edge_betweenness_centrality", seed=seed)
    name_of = graph.name_of()
    vid_of = {v: kk for kk, v in name_of.items()}
    src_vids: list[int] | None
    if sources is not None:
        src_vids = [vid_of[str(s)] for s in sources]
    elif k is not None:
        src_vids = sorted(name_of)[: int(k)]
    else:
        src_vids = None
    rows = _ebc(
        graph, sources=src_vids, normalized=normalized, weight=weight
    ).collect()
    return {
        (name_of[r["src"]], name_of[r["dst"]]): r["betweenness"] for r in rows
    }


def minimum_spanning_edge_list(
    graph: LinkGraph, maximum: bool = False, **ignored
) -> list:
    """Spanning-forest edges as (u_name, v_name) canonical pairs in a
    deterministic order (the Boruvka total order (w, u, v) makes the
    edge set unique on distinct-weight graphs; see operators/msf.py)."""
    from .operators.msf import minimum_spanning_edges as _msf

    graph._guard_adapter("spanning-forest adapters")
    name_of = graph.name_of()
    rows = _msf(graph, maximum=maximum).collect()
    return sorted(
        (name_of[r["src"]], name_of[r["dst"]]) for r in rows
    )


def bridge_list(graph: LinkGraph) -> list:
    """Bridges as sorted (u_name, v_name) canonical pairs
    (operators/bridges.py: XOR-covered spanning forest + CC-verified
    finisher, exact)."""
    from .operators.bridges import bridges as _br

    graph._guard_adapter("bridge adapters")
    name_of = graph.name_of()
    return sorted(
        (name_of[r["u"]], name_of[r["v"]]) for r in _br(graph).collect()
    )


def has_bridges(graph: LinkGraph) -> bool:
    from .operators.bridges import has_bridges as _hb

    graph._guard_adapter("bridge adapters")
    return _hb(graph)


def two_edge_component_sets(graph: LinkGraph) -> list:
    """2-edge-connected classes as a list of name sets
    (nx.k_edge_components(G, 2) parity)."""
    from .operators.bridges import two_edge_components as _tecc

    graph._guard_adapter("bridge adapters")
    name_of = graph.name_of()
    comps: dict = {}
    for r in _tecc(graph).collect():
        comps.setdefault(r["component"], set()).add(name_of[r["vid"]])
    return list(comps.values())


def local_bridge_list(graph: LinkGraph, with_span: bool = True) -> list:
    """Local bridges as (u_name, v_name) pairs; with spans when asked
    (None span -> the caller maps to float('inf'), nx parity)."""
    from .operators.bridges import local_bridges as _lb

    graph._guard_adapter("bridge adapters")
    name_of = graph.name_of()
    rows = _lb(graph, with_span=with_span).collect()
    if with_span:
        return sorted(
            (name_of[r["u"]], name_of[r["v"]], r["span"]) for r in rows
        )
    return sorted((name_of[r["u"]], name_of[r["v"]]) for r in rows)


def onion_layer_dict(graph: LinkGraph) -> dict:
    """nx.onion_layers-shaped {name: layer} dict
    (operators/onion.py bulk peeling)."""
    from .operators.onion import onion_layers as _ol

    graph._guard_adapter("onion adapters")
    name_of = graph.name_of()
    return {
        name_of[r["vid"]]: int(r["layer"]) for r in _ol(graph).collect()
    }


def percolation_centrality_dict(
    graph: LinkGraph, states: dict, weight=None, **ignored
) -> dict:
    """nx.percolation_centrality-shaped {name: value} dict
    (operators/percolation.py; states keyed by vertex NAME)."""
    from .operators.percolation import percolation_centrality as _pc

    graph._guard_adapter("percolation adapters")
    vid_of, name_of = graph.vid_of(), graph.name_of()
    sdf = graph.spark.createDataFrame(
        [(vid_of[k], float(v)) for k, v in states.items()],
        "vid long, x double",
    )
    return {
        name_of[r["vid"]]: float(r["percolation"])
        for r in _pc(graph, sdf, weight=weight).collect()
    }


def bipartite_projection_weights(
    graph: LinkGraph, node_names: list, max_center_degree=None
) -> dict:
    """{(u_name, v_name): {common, ratio, jaccard, overlap_min,
    collab}} for the one-mode projection onto node_names
    (operators/bipartite.py bipartite_projection)."""
    from .operators.bipartite import bipartite_projection as _bp

    graph._guard_adapter("bipartite projection adapters")
    vid_of, name_of = graph.vid_of(), graph.name_of()
    nodes = graph.spark.createDataFrame(
        [(vid_of[str(n)],) for n in node_names], "vid long"
    )
    out = {}
    for r in _bp(graph, nodes, max_center_degree=max_center_degree).collect():
        out[(name_of[r["u"]], name_of[r["v"]])] = {
            "common": int(r["common"]),
            "ratio": float(r["ratio"]),
            "jaccard": float(r["jaccard"]),
            "overlap_min": float(r["overlap_min"]),
            "collab": float(r["collab"]),
        }
    return out


def simrank_similarity_dict(
    graph: LinkGraph,
    importance_factor: float = 0.9,
    max_iterations: int = 1000,
    tolerance: float = 1e-4,
) -> dict:
    """nx.simrank_similarity-shaped DENSE dict-of-dicts (absent sparse
    support pairs expanded to 0.0), keyed by vertex name
    (operators/simrank.py)."""
    from .operators.simrank import simrank_similarity as _sr

    graph._guard_adapter("simrank adapters")
    name_of = graph.name_of()
    sparse = {}
    for r in _sr(
        graph,
        importance_factor=importance_factor,
        max_iterations=max_iterations,
        tolerance=tolerance,
    ).collect():
        sparse[(r["a"], r["b"])] = float(r["sim"])
    names = list(name_of)
    return {
        name_of[a]: {name_of[b]: sparse.get((a, b), 0.0) for b in names}
        for a in names
    }


def load_centrality_dict(
    graph: LinkGraph, normalized=True, weight=None, cutoff=None
) -> dict:
    """nx.load_centrality-shaped {name: value} dict
    (operators/load.py equal-split flow accumulation)."""
    from .operators.load import load_centrality as _load

    graph._guard_adapter("load centrality adapters")
    name_of = graph.name_of()
    return {
        name_of[r["vid"]]: float(r["load"])
        for r in _load(
            graph, normalized=normalized, weight=weight, cutoff=cutoff
        ).collect()
    }


def _node_values_df(graph: LinkGraph, values: dict, numeric: bool):
    vid_of = graph.vid_of()
    typ = "double" if numeric else "string"
    return graph.spark.createDataFrame(
        [
            (vid_of[str(k)], float(v) if numeric else str(v))
            for k, v in values.items()
        ],
        f"vid long, att {typ}",
    )


def attribute_assortativity(graph: LinkGraph, values: dict, node_names=None) -> float:
    """nx.attribute_assortativity_coefficient over name-keyed
    categorical values (operators/assortativity.py)."""
    from .operators.assortativity import attribute_assortativity_coefficient

    graph._guard_adapter("assortativity adapters")
    nodes = None
    if node_names is not None:
        vid_of = graph.vid_of()
        nodes = graph.spark.createDataFrame(
            [(vid_of[str(n)],) for n in node_names], "vid long"
        )
    return attribute_assortativity_coefficient(
        graph, _node_values_df(graph, values, numeric=False), nodes
    )


def numeric_assortativity(graph: LinkGraph, values: dict, node_names=None) -> float:
    """nx.numeric_assortativity_coefficient over name-keyed scalar
    values (operators/assortativity.py)."""
    from .operators.assortativity import numeric_assortativity_coefficient

    graph._guard_adapter("assortativity adapters")
    nodes = None
    if node_names is not None:
        vid_of = graph.vid_of()
        nodes = graph.spark.createDataFrame(
            [(vid_of[str(n)],) for n in node_names], "vid long"
        )
    return numeric_assortativity_coefficient(
        graph, _node_values_df(graph, values, numeric=True), nodes
    )


def _directed_degree_imbalance(graph: LinkGraph):
    """DataFrame(vid, ins, outs) over edge-touched vertices."""
    from pyspark.sql import functions as F

    e = graph.edges.select("src", "dst")
    outs = e.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("outs"))
    ins = e.groupBy(F.col("dst").alias("vid")).agg(F.count("*").alias("ins"))
    return outs.join(ins, "vid", "full_outer").select(
        "vid",
        F.coalesce("ins", F.lit(0)).alias("ins"),
        F.coalesce("outs", F.lit(0)).alias("outs"),
    )


def is_eulerian(graph: LinkGraph) -> bool:
    """nx.is_eulerian parity: balanced degrees + the matching
    connectivity predicate (one degree aggregate + the existing
    CC/SCC operator; NetworkXPointlessConcept propagates from the
    connectivity check on the null graph, as in nx)."""
    from pyspark.sql import functions as F

    if graph.directed:
        bal = _directed_degree_imbalance(graph).where(
            F.col("ins") != F.col("outs")
        )
        return bal.isEmpty() and is_strongly_connected(graph)
    e = graph.edges.select("src", "dst")
    deg = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("d"))
    )
    return deg.where(F.col("d") % 2 != 0).isEmpty() and is_connected(graph)


def has_eulerian_path(graph: LinkGraph, source=None) -> bool:
    """nx.has_eulerian_path parity (source by vertex NAME)."""
    from pyspark.sql import functions as F

    if is_eulerian(graph):
        return True
    if graph.directed:
        imb = _directed_degree_imbalance(graph)
        if source is not None:
            vid = graph.vid_of()[str(source)]
            row = imb.where(F.col("vid") == vid).collect()
            diff = (row[0]["outs"] - row[0]["ins"]) if row else 0
            if diff != 1:
                return False
        counts = imb.agg(
            F.sum((F.col("ins") - F.col("outs") == 1).cast("int")).alias("ui"),
            F.sum((F.col("outs") - F.col("ins") == 1).cast("int")).alias("uo"),
            F.sum(
                (F.abs(F.col("ins") - F.col("outs")) > 1).cast("int")
            ).alias("bad"),
        ).first()
        if (counts["bad"] or 0) > 0:
            return False
        return (
            (counts["ui"] or 0) <= 1
            and (counts["uo"] or 0) <= 1
            and is_weakly_connected(graph)
        )
    e = graph.edges.select("src", "dst")
    deg = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("d"))
    )
    if source is not None:
        vid = graph.vid_of()[str(source)]
        row = deg.where(F.col("vid") == vid).collect()
        d = row[0]["d"] if row else 0
        if d % 2 != 1:
            return False
    n_odd = deg.where(F.col("d") % 2 == 1).count()
    return n_odd == 2 and is_connected(graph)


def is_semieulerian(graph: LinkGraph) -> bool:
    return has_eulerian_path(graph) and not is_eulerian(graph)


def transitive_closure_pairs(graph: LinkGraph, reflexive=False) -> set:
    """Closure edge set as name pairs (operators/closure.py)."""
    from .operators.closure import transitive_closure as _tc

    graph._guard_adapter("closure adapters")
    name_of = graph.name_of()
    return {
        (name_of[r["src"]], name_of[r["dst"]])
        for r in _tc(graph, reflexive=reflexive).collect()
    }


def transitive_reduction_pairs(graph: LinkGraph) -> set:
    """Reduction edge set as name pairs; ValueError on cycles."""
    from .operators.closure import transitive_reduction as _tr

    graph._guard_adapter("closure adapters")
    name_of = graph.name_of()
    return {
        (name_of[r["src"]], name_of[r["dst"]])
        for r in _tr(graph).collect()
    }


def weighted_closeness(
    graph: LinkGraph, u=None, wf_improved: bool = True
) -> dict | float:
    """nx.closeness_centrality(distance=...) parity — the weighted
    form the reference warns-and-ignores, served by
    operators/closeness.py weighted_closeness_centrality."""
    from .operators.closeness import weighted_closeness_centrality as _wc

    graph._guard_adapter("weighted closeness adapters")
    name_of = graph.name_of()
    if u is not None:
        vid = graph.vid_of()[str(u)]
        rows = _wc(graph, wf_improved=wf_improved, sources=[vid]).collect()
        return float(rows[0]["closeness"]) if rows else 0.0
    return {
        name_of[r["vid"]]: float(r["closeness"])
        for r in _wc(graph, wf_improved=wf_improved).collect()
    }


def dispersion_table(
    graph: LinkGraph, normalized=True, alpha=1.0, b=0.0, c=0.0
) -> dict:
    """{(u_name, v_name): dispersion} over every oriented adjacent
    pair (operators/dispersion.py)."""
    from .operators.dispersion import dispersion as _disp

    graph._guard_adapter("dispersion adapters")
    name_of = graph.name_of()
    return {
        (name_of[r["u"]], name_of[r["v"]]): float(r["dispersion"])
        for r in _disp(
            graph, normalized=normalized, alpha=alpha, b=b, c=c
        ).collect()
    }


def generalized_degree_dict(graph: LinkGraph) -> dict:
    """nx.generalized_degree-shaped {name: {t: count}} dict
    (operators/ktruss.py generalized_degree)."""
    from .operators.ktruss import generalized_degree as _gd

    graph._guard_adapter("generalized-degree adapters")
    name_of = graph.name_of()
    out: dict = {name_of[v]: {} for v in name_of}
    for r in _gd(graph).collect():
        out[name_of[r["vid"]]][int(r["t"])] = int(r["cnt"])
    return out
