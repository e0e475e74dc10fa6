from .pagerank import pagerank  # noqa: F401
from .hits import hits  # noqa: F401
