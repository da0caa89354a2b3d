from rove_spark.operators.gridfill import grid_fill  # noqa: F401
from rove_spark.operators.signals import derive_signals  # noqa: F401
