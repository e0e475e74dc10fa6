"""Pure-python NetworkX-semantics oracles (scipy is not installed in
this sandbox, so nx.pagerank's default scipy path is unavailable).

``nx_pagerank`` prefers networkx's own pure-python implementation
(networkx.algorithms.link_analysis.pagerank_alg._pagerank_python),
falling back to a faithful re-statement of the same algorithm.
"""

from __future__ import annotations

import networkx as nx


def nx_pagerank(
    g,
    alpha=0.85,
    personalization=None,
    max_iter=100,
    tol=1e-6,
    nstart=None,
    weight="weight",
    dangling=None,
):
    try:
        from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

        return _pagerank_python(
            g,
            alpha=alpha,
            personalization=personalization,
            max_iter=max_iter,
            tol=tol,
            nstart=nstart,
            weight=weight,
            dangling=dangling,
        )
    except ImportError:
        pass
    # Fallback: NetworkX power-iteration semantics, verbatim.
    if len(g) == 0:
        return {}
    D = g.to_directed()
    W = nx.stochastic_graph(D, weight=weight)
    N = W.number_of_nodes()
    if nstart is None:
        x = dict.fromkeys(W, 1.0 / N)
    else:
        s = float(sum(nstart.values()))
        x = {k: v / s for k, v in nstart.items()}
    if personalization is None:
        p = dict.fromkeys(W, 1.0 / N)
    else:
        s = float(sum(personalization.values()))
        p = {k: personalization.get(k, 0) / s for k in W}
    if dangling is None:
        dangling_weights = p
    else:
        s = float(sum(dangling.values()))
        dangling_weights = {k: dangling.get(k, 0) / s for k in W}
    dangling_nodes = [n for n in W if W.out_degree(n, weight=weight) == 0.0]
    for _ in range(max_iter):
        xlast = x
        x = dict.fromkeys(xlast.keys(), 0)
        danglesum = alpha * sum(xlast[n] for n in dangling_nodes)
        for n in x:
            for _, nbr, wt in W.edges(n, data=weight):
                x[nbr] += alpha * xlast[n] * wt
            x[n] += danglesum * dangling_weights.get(n, 0) + (1.0 - alpha) * p.get(n, 0)
        err = sum(abs(x[n] - xlast[n]) for n in x)
        if err < N * tol:
            return x
    raise nx.PowerIterationFailedConvergence(max_iter)


def nx_pagerank_deltas(
    g,
    up_to,
    alpha=0.85,
    weight="weight",
):
    """Per-iteration L1 deltas ``sum|x_t - x_{t-1}|`` of the NetworkX
    power iteration for ``up_to`` steps (index 0 = delta after the
    first update). Lets tests derive both NetworkX's stopping iteration
    (first t with delta < N*tol) and the engine's blocked stop (first
    multiple of check_every with delta < N*tol) without assuming the
    delta sequence is monotone."""
    if len(g) == 0:
        return []
    D = g.to_directed()
    W = nx.stochastic_graph(D, weight=weight)
    N = W.number_of_nodes()
    x = dict.fromkeys(W, 1.0 / N)
    p = dict.fromkeys(W, 1.0 / N)
    dangling_nodes = [n for n in W if W.out_degree(n, weight=weight) == 0.0]
    deltas = []
    for _ in range(up_to):
        xlast = x
        x = dict.fromkeys(xlast.keys(), 0)
        danglesum = alpha * sum(xlast[n] for n in dangling_nodes)
        for n in x:
            for _, nbr, wt in W.edges(n, data=weight):
                x[nbr] += alpha * xlast[n] * wt
            x[n] += danglesum * p.get(n, 0) + (1.0 - alpha) * p.get(n, 0)
        deltas.append(sum(abs(x[n] - xlast[n]) for n in x))
    return deltas


def nx_pagerank_fixed(
    g,
    iterations,
    alpha=0.85,
    personalization=None,
    nstart=None,
    weight="weight",
    dangling=None,
):
    """NetworkX power-iteration semantics run for EXACTLY ``iterations``
    steps (no convergence stop) -- oracle for the engine's
    fixed_iterations/lazy path."""
    if len(g) == 0:
        return {}
    D = g.to_directed()
    W = nx.stochastic_graph(D, weight=weight)
    N = W.number_of_nodes()
    if nstart is None:
        x = dict.fromkeys(W, 1.0 / N)
    else:
        s = float(sum(nstart.values()))
        x = {k: nstart[k] / s for k in W}
    if personalization is None:
        p = dict.fromkeys(W, 1.0 / N)
    else:
        s = float(sum(personalization.values()))
        p = {k: personalization.get(k, 0) / s for k in W}
    if dangling is None:
        dangling_weights = p
    else:
        s = float(sum(dangling.values()))
        dangling_weights = {k: dangling.get(k, 0) / s for k in W}
    dangling_nodes = [n for n in W if W.out_degree(n, weight=weight) == 0.0]
    for _ in range(iterations):
        xlast = x
        x = dict.fromkeys(xlast.keys(), 0)
        danglesum = alpha * sum(xlast[n] for n in dangling_nodes)
        for n in x:
            for _, nbr, wt in W.edges(n, data=weight):
                x[nbr] += alpha * xlast[n] * wt
            x[n] += danglesum * dangling_weights.get(n, 0) + (1.0 - alpha) * p.get(n, 0)
    return x


def nx_hits(g, max_iter=100, tol=1e-8, nstart=None, normalized=True,
            fixed_iterations=None, weight=None):
    """Pure-python HITS, faithful to NetworkX hits_alg semantics
    (nx.hits itself needs scipy, absent here): a from normalized
    h_{k-1}; h from RAW a_k; both max-normalized; L1(h) stop; final
    sum-normalization. Returns (hubs, authorities) dicts."""
    n = g.number_of_nodes()
    if n == 0:
        return {}, {}
    if g.number_of_edges() == 0:
        z = dict.fromkeys(g, 0.0)
        return dict(z), dict(z)
    if nstart is None:
        h = dict.fromkeys(g, 1.0 / n)
    else:
        s = sum(nstart.values())
        h = {k: v / s for k, v in nstart.items()}
    a = dict.fromkeys(g, 0.0)
    limit = fixed_iterations if fixed_iterations is not None else max_iter
    for _ in range(limit):
        hlast = h
        a = dict.fromkeys(g, 0.0)
        h = dict.fromkeys(g, 0.0)
        for u in hlast:
            for v in g[u]:
                w = g[u][v].get(weight, 1.0) if weight else 1.0
                a[v] += hlast[u] * w
        for u in g:
            for v in g[u]:
                w = g[u][v].get(weight, 1.0) if weight else 1.0
                h[u] += a[v] * w
        hm = max(h.values())
        h = {k: v / hm for k, v in h.items()}
        am = max(a.values())
        a = {k: v / am for k, v in a.items()}
        if fixed_iterations is None:
            err = sum(abs(h[k] - hlast.get(k, 0.0)) for k in h)
            if err < tol:
                break
    else:
        if fixed_iterations is None:
            raise RuntimeError(f"HITS power iteration failed in {max_iter}")
    if normalized:
        hs = sum(h.values())
        h = {k: v / hs for k, v in h.items()}
        asum = sum(a.values())
        a = {k: v / asum for k, v in a.items()}
    return h, a


def nx_eigenvector_fixed(g, iterations, nstart=None, weight=None):
    """NetworkX eigenvector_centrality update rule (x' = (x + A^T x) /
    ||.||_2, successors contribute into their targets) run for EXACTLY
    ``iterations`` steps -- oracle for the engine's fixed-depth lazy
    path (nx.eigenvector_centrality itself only has the tol stop)."""
    import math

    n = g.number_of_nodes()
    if nstart is None:
        nstart = dict.fromkeys(g, 1.0)
    s = float(sum(nstart.values()))
    x = {k: v / s for k, v in nstart.items()}
    for _ in range(iterations):
        xlast = x
        x = dict(xlast)
        for u in g:
            for v in g[u]:
                w = g[u][v].get(weight, 1.0) if weight else 1.0
                x[v] += xlast[u] * w
        norm = math.hypot(*x.values()) or 1.0
        x = {k: v / norm for k, v in x.items()}
    return x
