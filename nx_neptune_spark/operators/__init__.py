from .pagerank import pagerank  # noqa: F401
