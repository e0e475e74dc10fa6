from .checkpoint import CheckpointManager, IterationMetrics  # noqa: F401
from .skew import salted_sum  # noqa: F401
