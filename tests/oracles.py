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
