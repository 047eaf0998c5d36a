"""dedup_exact_substring: the stride-1 window profile must catch UNALIGNED
cross-document repeats that disjoint passage chunking misses — the property
that justifies paying W× more window hashes.
"""

import os

from mysql_cdc_debezium_starrocks_spark.operators.dedup import (
    SUBSTR_W,
    dedup_exact_substring,
    dedup_passage_exact,
)


def _write_docs(spark, path, docs):
    rows = [
        (i, text, "en", "synth", len(text)) for i, text in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    df.coalesce(1).write.parquet(os.path.join(path, "documents.parquet"))


def test_catches_unaligned_repeat_that_chunking_misses(spark, tmp_path):
    """Doc B embeds an 8-word run of doc A at an offset that straddles the
    5-word passage boundaries: no disjoint chunk matches, but stride-1
    windows light up in both docs."""
    run = " ".join(f"shared{i}" for i in range(SUBSTR_W))
    doc_a = " ".join(f"alpha{i}" for i in range(7)) + " " + run + " alphaend"
    doc_b = " ".join(f"beta{i}" for i in range(3)) + " " + run + " " + " ".join(
        f"betaend{i}" for i in range(6)
    )
    sf = str(tmp_path)
    _write_docs(spark, sf, [doc_a, doc_b])

    sub = {r["doc_id"]: r for r in dedup_exact_substring(spark, sf).collect()}
    assert sub[0]["n_dup_windows"] >= 1 and sub[1]["n_dup_windows"] >= 1
    assert float(sub[0]["dup_frac"]) > 0 and float(sub[1]["dup_frac"]) > 0

    chunks = {r["doc_id"]: r for r in dedup_passage_exact(spark, sf).collect()}
    assert chunks[0]["n_shared_chunks"] == 0 and chunks[1]["n_shared_chunks"] == 0


def test_window_count_and_bounds(spark, tmp_path):
    """n_windows = n_words - W + 1; docs shorter than W produce no row;
    dup_frac within [0, 1]; a fully duplicated doc pair scores 1.0."""
    text = " ".join(f"w{i}" for i in range(20))
    short = "only three words"
    sf = str(tmp_path)
    _write_docs(spark, sf, [text, text, short])
    rows = {r["doc_id"]: r for r in dedup_exact_substring(spark, sf).collect()}
    assert set(rows) == {0, 1}  # the 3-word doc has no window
    for i in (0, 1):
        assert rows[i]["n_windows"] == 20 - SUBSTR_W + 1
        assert float(rows[i]["dup_frac"]) == 1.0
