"""Structured Streaming layer: CDC materializer + load-job control plane."""

from .jobs import LoadJobManager
from .materializer import (
    CdcLoadConfig,
    kafka_stream,
    merge_batch,
    read_state,
    start_cdc_load,
)

__all__ = [
    "CdcLoadConfig",
    "LoadJobManager",
    "kafka_stream",
    "merge_batch",
    "read_state",
    "start_cdc_load",
]
