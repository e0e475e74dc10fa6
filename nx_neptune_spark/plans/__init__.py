from .checkpoint import CheckpointManager, IterationMetrics  # noqa: F401
from .skew import salted_sum, split_hubs  # noqa: F401
