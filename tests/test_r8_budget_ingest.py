"""Round-8 streaming token-budget admission (``streaming.budget_ingest``)
— the arrival-order twin of ``sample_token_budget`` / ``mix_budget_report``.

Pins, against the batch operators and a direct python replay:

1. **Batch-twin equality**: feeding the corpus in hash-priority order
   across several micro-batches admits EXACTLY ``sample_token_budget``'s
   kept set, and ``budget_report`` equals ``mix_budget_report``
   row-for-row — the streaming cut is the same prefix rule, just over
   arrival order.  (Docs are renumbered by priority rank so arrival order
   == the maintainer's intra-batch doc_id order == the batch operator's
   priority order; the maintainer sees only order + token counts, so the
   renumbering is behavior-neutral.)
2. **Monotone closure**: in arbitrary arrival order, admission equals the
   seen-prefix python replay — a source whose cumulative stream crossed
   the budget stays closed — and per-source admitted tokens never exceed
   the budget.
3. **Replay idempotency**: re-ingesting the last batch (crash replay)
   leaves admissions and the report byte-identical.
4. **Compaction equality**: folding the stores changes neither the
   admitted set nor the report.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.operators.stats import (
    TOKEN_BUDGET,
    mix_budget_report,
    sample_token_budget,
)
from mysql_cdc_debezium_starrocks_spark.streaming.budget_ingest import (
    admitted_docs,
    budget_report,
    compact_budget_ingest,
    ingest_budget_batch,
)

from .conftest import SF_SMOKE


def _pri(doc_id: int) -> int:
    return int(hashlib.md5(f"tb:{doc_id}".encode()).hexdigest()[:8], 16)


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_budget_ingest_priority_order_equals_batch_operator(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    ordered = sorted(docs.collect(), key=lambda r: (_pri(r.doc_id), r.doc_id))
    rank_of = {r.doc_id: i for i, r in enumerate(ordered)}
    state = str(tmp_path / "bud")
    n = len(ordered)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        chunk = ordered[cuts[i]: cuts[i + 1]]
        df = spark.createDataFrame(
            [(rank_of[r.doc_id], r.source, r.text) for r in chunk],
            "doc_id long, source string, text string",
        )
        ingest_budget_batch(spark, state, df, batch_id=i)

    want = {
        (rank_of[r.doc_id], r.source, r.tk)
        for r in sample_token_budget(spark, SF_SMOKE).collect()
    }
    got = {
        (r.doc_id, r.source, r.tk)
        for r in admitted_docs(spark, state).collect()
    }
    assert got == want and got

    assert rows(budget_report(spark, state)) == rows(
        mix_budget_report(spark, SF_SMOKE)
    )


def test_budget_ingest_monotone_closure_and_replay(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    state = str(tmp_path / "bud2")
    parts = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, part in enumerate(parts):
        ingest_budget_batch(spark, state, part, batch_id=i)

    adm = admitted_docs(spark, state)
    per_src = {
        r.source: r.kt
        for r in adm.groupBy("source").agg(F.sum("tk").alias("kt")).collect()
    }
    assert per_src and all(v <= TOKEN_BUDGET for v in per_src.values())

    # monotone closure: the seen-prefix rule replayed in python
    all_rows = docs.collect()
    seen: dict[str, int] = {}
    want = set()
    for i in range(3):
        batch = sorted(
            (r for r in all_rows if r.doc_id % 3 == i),
            key=lambda r: r.doc_id,
        )
        for r in batch:
            tk = len([w for w in r.text.lower().split() if w])
            seen[r.source] = seen.get(r.source, 0) + tk
            if seen[r.source] <= TOKEN_BUDGET:
                want.add((r.doc_id, r.source, tk))
    got = {(r.doc_id, r.source, r.tk) for r in adm.collect()}
    assert got == want

    before = rows(budget_report(spark, state))
    ingest_budget_batch(spark, state, parts[2], batch_id=2)  # crash replay
    assert rows(budget_report(spark, state)) == before
    assert {
        (r.doc_id, r.source, r.tk)
        for r in admitted_docs(spark, state).collect()
    } == got

    compact_budget_ingest(spark, state, keep_last=1)
    assert rows(budget_report(spark, state)) == before
    assert {
        (r.doc_id, r.source, r.tk)
        for r in admitted_docs(spark, state).collect()
    } == got


def test_start_budget_ingest_streaming_drain(spark, tmp_path):
    """The readStream wiring: two parquet drops drained availableNow must
    leave the same admissions as driving ingest_budget_batch directly with
    the same split (file order pins batch order via one file per drop)."""
    from mysql_cdc_debezium_starrocks_spark.streaming.budget_ingest import (
        start_budget_ingest,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    parts = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    src = str(tmp_path / "src")
    state_s = str(tmp_path / "stream")
    state_b = str(tmp_path / "batch")

    parts[0].coalesce(1).write.parquet(src)
    q = start_budget_ingest(
        spark, src, state_s, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    parts[1].coalesce(1).write.mode("append").parquet(src)
    q = start_budget_ingest(
        spark, src, state_s, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    for i, part in enumerate(parts):
        ingest_budget_batch(spark, state_b, part, batch_id=i)

    def adm(state):
        return {
            (r.doc_id, r.source, r.tk)
            for r in admitted_docs(spark, state).collect()
        }

    assert adm(state_s) == adm(state_b) and adm(state_s)
    assert rows(budget_report(spark, state_s)) == rows(
        budget_report(spark, state_b)
    )
