"""Structured Streaming layer: CDC materializer, load-job control plane,
and event-time analytics (watermarked/session windows, keyed dedup,
stateful running counters)."""

from .ann_ingest import ann_index_query, ingest_ann_batch, read_ann_index, start_ann_ingest
from .agg_mv import compact_agg_mv, merge_agg_mv_batch, read_agg_mv, start_agg_mv_load
from .audit import audit_state
from .analytics import (
    dedup_within_watermark,
    running_user_stats,
    sessionize,
    windowed_counts,
)
from .heavy_hitters import (
    heavy_hitters_view,
    merge_heavy_hitters_batch,
    start_heavy_hitters_load,
)
from .incremental_snapshot import (
    plan_incremental_snapshot,
    run_incremental_snapshot,
)
from .jobs import LoadJobManager
from .join_mv import JoinMVConfig, merge_join_mv_batch, read_join_mv
from .materializer import (
    CdcLoadConfig,
    gc_tombstones,
    kafka_stream,
    merge_batch,
    read_state,
    register_live_view,
    start_cdc_load,
)
from .schema_drift import detect_schema_drift, read_drift_log
from .secondary_index import build_secondary_index, lookup_by_index
from .table_stats import read_stats, recommend_broadcast, update_stats_batch
from .theta_stats import (
    containment_between,
    overlap_between,
    read_theta,
    start_theta_load,
    update_theta_batch,
)

__all__ = [
    "CdcLoadConfig",
    "ann_index_query",
    "audit_state",
    "compact_agg_mv",
    "merge_agg_mv_batch",
    "read_agg_mv",
    "start_agg_mv_load",
    "ingest_ann_batch",
    "read_ann_index",
    "start_ann_ingest",
    "LoadJobManager",
    "dedup_within_watermark",
    "detect_schema_drift",
    "gc_tombstones",
    "heavy_hitters_view",
    "JoinMVConfig",
    "kafka_stream",
    "merge_join_mv_batch",
    "read_join_mv",
    "merge_heavy_hitters_batch",
    "start_heavy_hitters_load",
    "merge_batch",
    "plan_incremental_snapshot",
    "build_secondary_index",
    "lookup_by_index",
    "read_drift_log",
    "read_stats",
    "recommend_broadcast",
    "read_state",
    "register_live_view",
    "run_incremental_snapshot",
    "running_user_stats",
    "sessionize",
    "start_cdc_load",
    "update_stats_batch",
    "containment_between",
    "overlap_between",
    "read_theta",
    "start_theta_load",
    "update_theta_batch",
    "windowed_counts",
]
