"""Utilities: profiling, logging, metrics."""
from phosphorus_mk2_tpu.utils.log import (  # noqa: F401
    Metrics,
    get_logger,
    set_level,
)
