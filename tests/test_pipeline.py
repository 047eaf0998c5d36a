"""Fluent corpus pipeline (pipeline.py): the composed funnel must equal the
hand-written corpus_curate reference, stay lazy until a terminal, and
export runnable shards.
"""

import glob

from mysql_cdc_debezium_starrocks_spark.pipeline import CorpusPipeline

SF = "/root/testdata/sf0.001"


def test_facade_matches_reference_funnel(spark):
    from mysql_cdc_debezium_starrocks_spark.operators.text import corpus_curate

    p = (
        CorpusPipeline(spark, SF)
        .drop_eval_split()
        .quality()
        .dedup()
        .decontaminate()
    )
    got = sorted(r["doc_id"] for r in p.df.select("doc_id").collect())
    want = sorted(r["doc_id"] for r in corpus_curate(spark, SF).collect())
    assert got == want and got
    assert p.steps == ["drop_eval_split", "quality>=0.65", "dedup", "decontaminate"]


def test_perplexity_step_filters_outliers(spark):
    """The LM filter must drop exactly the docs whose ppl exceeds the
    threshold — pick the corpus median ppl so the cut is non-trivial."""
    from mysql_cdc_debezium_starrocks_spark.operators.text import text_perplexity

    ppls = sorted(
        float(r["ppl"]) for r in text_perplexity(spark, SF).collect()
    )
    cut = ppls[len(ppls) // 2]
    kept = CorpusPipeline(spark, SF).perplexity(cut).count()
    assert kept == sum(1 for p in ppls if p <= cut)
    assert 0 < kept < len(ppls)


def test_split_column_and_export(spark, tmp_path):
    p = CorpusPipeline(spark, SF).quality().split()
    df = p.df
    assert "split" in df.columns
    splits = {r["split"] for r in df.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits

    out = str(tmp_path / "shards")
    p.export(out, shards=4)
    files = glob.glob(f"{out}/_shard=*/*.parquet")
    assert files
    back = spark.read.parquet(out)
    assert back.count() == df.count()


def test_chunk_step_matches_standalone_op(spark):
    """Unfiltered pipeline chunking equals text_chunk; a filtered pipeline
    chunks exactly the surviving documents."""
    from mysql_cdc_debezium_starrocks_spark.operators.text import text_chunk

    all_rows = sorted(
        tuple(r) for r in CorpusPipeline(spark, SF).chunk().df.collect()
    )
    want = sorted(tuple(r) for r in text_chunk(spark, SF).collect())
    assert all_rows == want and all_rows

    p = CorpusPipeline(spark, SF).quality()
    kept = {r["doc_id"] for r in p.df.select("doc_id").collect()}
    chunked = CorpusPipeline(spark, SF).quality().chunk()
    assert {r["doc_id"] for r in chunked.df.collect()} == kept
    assert chunked.steps == ["quality>=0.65", "chunk"]
