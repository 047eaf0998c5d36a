"""Structured Streaming layer: CDC materializer, load-job control plane,
and event-time analytics (watermarked/session windows, keyed dedup,
stateful running counters)."""

from .analytics import (
    dedup_within_watermark,
    running_user_stats,
    sessionize,
    windowed_counts,
)
from .jobs import LoadJobManager
from .materializer import (
    CdcLoadConfig,
    kafka_stream,
    merge_batch,
    read_state,
    register_live_view,
    start_cdc_load,
)

__all__ = [
    "CdcLoadConfig",
    "LoadJobManager",
    "dedup_within_watermark",
    "kafka_stream",
    "merge_batch",
    "read_state",
    "register_live_view",
    "running_user_stats",
    "sessionize",
    "start_cdc_load",
    "windowed_counts",
]
