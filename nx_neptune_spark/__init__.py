"""nx-neptune-spark: a PySpark-native link-graph analytics engine.

From-scratch rebuild of the analytics surface that awslabs/nx-neptune
dispatches to AWS Neptune Analytics (reference read-only at
/root/reference), re-expressed as DataFrame programs: PageRank,
connected components, label propagation, triangle counting, degree /
closeness centrality, BFS variants -- plus the web-page extraction
pipeline (html -> text/links via vectorized pandas UDFs) and
training-data operators (dedup, similarity search, text analysis).
"""

from .graph import LinkGraph
from .session import get_spark


def register_nx_backend(name: str = "spark") -> str:
    """Register the NetworkX ``backend="spark"`` dispatch (see
    interface.py; equivalent of the reference's networkx.backends entry
    point taking effect)."""
    from .interface import register

    return register(name)


__all__ = ["LinkGraph", "get_spark", "register_nx_backend"]
__version__ = "0.1.0"
