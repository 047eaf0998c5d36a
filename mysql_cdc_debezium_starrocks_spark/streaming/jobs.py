"""Load-job control plane: the SHOW/STOP/RESUME ROUTINE LOAD analog.

The reference manages continuous loads with FE-side job state and SQL verbs
(reference: create-routine-load.sh:15-48 CREATE; monitor.sh:11-21 SHOW;
docs/TROUBLESHOOTING.md:64-70 STOP/RESUME; :213-219 ALTER) and connectors
over Kafka Connect REST (register-debezium.sh:13-22).  Spark's equivalents
are StreamingQuery lifecycle + checkpoint resume; this module packages them
with the same verb surface so a reference user can map 1:1:

    mgr.create(cfg)      ~ CREATE ROUTINE LOAD / POST /connectors
    mgr.show()           ~ SHOW ROUTINE LOAD \\G  (state, lag, progress)
    mgr.stop(name)       ~ STOP ROUTINE LOAD (offsets kept in checkpoint)
    mgr.resume(name)     ~ RESUME ROUTINE LOAD (same checkpoint -> same
                           consumer-group position, T3)
    mgr.alter(name, **)  ~ ALTER ROUTINE LOAD PROPERTIES (stop + restart
                           with new options; neither engine hot-swaps)
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import SparkSession

from .materializer import CdcLoadConfig, gc_ledger_stats, start_cdc_load


class LoadJobManager:
    """Named continuous-load jobs over one SparkSession."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._configs: dict[str, CdcLoadConfig] = {}
        self._queries: dict[str, object] = {}

    # -- CREATE ROUTINE LOAD ------------------------------------------------
    def create(self, cfg: CdcLoadConfig):
        if cfg.name in self._queries and self._queries[cfg.name].isActive:
            raise ValueError(f"load job {cfg.name!r} already running")
        q = start_cdc_load(self.spark, cfg)
        self._configs[cfg.name] = cfg
        self._queries[cfg.name] = q
        return q

    # -- SHOW ROUTINE LOAD [TASK] --------------------------------------------
    def show(self) -> list[dict]:
        """One row per job, mirroring SHOW ROUTINE LOAD's key fields."""
        out = []
        for name, q in self._queries.items():
            p = q.lastProgress or {}
            sources = p.get("sources") or [{}]
            src = sources[0] if sources else {}
            out.append(
                {
                    "JobName": name,                        # monitor.sh:21
                    "State": "RUNNING" if q.isActive else "STOPPED",
                    "Progress": src.get("endOffset"),
                    "Statistic": {
                        "batchId": p.get("batchId"),
                        "numInputRows": p.get("numInputRows"),
                        "inputRowsPerSecond": p.get("inputRowsPerSecond"),
                    },
                    # str(), not .desc: StreamingQueryException exposes no
                    # public desc in PySpark 4.x — .desc would AttributeError
                    # exactly when a job HAS failed and OtherMsg matters
                    "OtherMsg": str(q.exception()) if q.exception() else None,
                    # tombstone-GC interval ledger (n_gaps / oldest gap age):
                    # the evidence behind gc_reorder_grace_batches, mirroring
                    # SHOW ROUTINE LOAD's progress/lag (monitor.sh:11-21)
                    "GcLedger": (
                        gc_ledger_stats(self._configs[name])
                        if name in self._configs
                        else None
                    ),
                }
            )
        return out

    # -- STOP / RESUME / ALTER -------------------------------------------------
    def stop(self, name: str) -> None:
        self._queries[name].stop()

    def resume(self, name: str):
        """Restart from the same checkpoint — offsets resume where stopped."""
        cfg = self._configs[name]
        if self._queries[name].isActive:
            raise ValueError(f"{name!r} still active; stop it first")
        q = start_cdc_load(self.spark, cfg)
        self._queries[name] = q
        return q

    def alter(self, name: str, **changes):
        """Stop + restart with new properties (same checkpoint)."""
        self.stop(name)
        self._queries[name].awaitTermination(30)
        cfg = replace(self._configs[name], **changes)
        self._configs[name] = cfg
        q = start_cdc_load(self.spark, cfg)
        self._queries[name] = q
        return q

    def await_all(self, timeout_s: int = 120) -> None:
        for q in self._queries.values():
            q.awaitTermination(timeout_s)
