from argus_spark.lifecycle.dag import Reducer, ReducerRegistry  # noqa: F401
from argus_spark.lifecycle.driver import IndexDriver  # noqa: F401
from argus_spark.lifecycle.state import (  # noqa: F401
    CheckpointWindowError,
    Point,
    normalize_rollback,
    window_roll_back,
    window_roll_forward,
)
from argus_spark.lifecycle.store import ParquetStateStore  # noqa: F401
