"""PySpark-native analytics engine with the capabilities of the reference
CDC pipeline (ajithdaniel/mysql-cdc-debezium-starrocks).

The reference wires MySQL binlog -> Debezium -> Kafka -> StarRocks Routine
Load -> Primary-Key tables (reference: docker-compose.yml:3-123,
docs/ARCHITECTURE.md:5-55).  This package re-expresses that dataflow and its
entire query surface Spark-first:

- ``cdc``        : CDC event model, envelope parsing, keyed last-write-wins
                   apply (replaces Debezium unwrap + StarRocks PK tables).
- ``streaming``  : Structured Streaming materializer, job manager, workload
                   generator (replaces Kafka + Routine Load + monitor.sh).
- ``operators``  : the full relational query surface the reference's scripts
                   exercise, plus large-scale training-data operators
                   (dedup, similarity search, text analysis, multimodal).
- ``functions``  : portable deterministic hashing / vector helpers shared by
                   operators and their DuckDB oracles.
- ``sources``    : batch/stream readers for parquet fixtures, JSON event
                   dirs, Kafka, and the rate-driven synthesizer.
- ``plans``      : plan-inspection helpers (explain, shuffle audit) and the
                   ``plans.advisor.advise`` anti-pattern linter.
- ``storage``    : physical-layout tools — bucketed/partitioned/z-order
                   clustered writes, salted joins, compaction, retention.
- ``pipeline``   : ``CorpusPipeline``, the fluent curation facade.

Round-2 streaming additions: incremental join MV (``streaming.join_mv``),
generic aggregate MV (``streaming.agg_mv``), heavy hitters, ANN-at-ingest,
table statistics, state audit, secondary indexes — see COVERAGE.md.
"""

__version__ = "0.1.0"
