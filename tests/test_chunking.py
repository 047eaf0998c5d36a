"""text_chunk (RAG windowing) and events_top_paths: invariants + plan shape.

Value-level correctness is the DuckDB oracle's job (tools/parity.py); these
tests pin the structural contracts the oracle can't see: chunk coverage /
overlap arithmetic, session-gap bounding, and the no-extra-shuffle plans.
"""

from collections import defaultdict

from mysql_cdc_debezium_starrocks_spark.operators.events import (
    SESSION_GAP_MIN,
    events_top_paths,
)
from mysql_cdc_debezium_starrocks_spark.operators.text import (
    CHUNK_OVERLAP,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    text_chunk,
)
from mysql_cdc_debezium_starrocks_spark.plans import (
    has_cartesian,
    partial_aggregates,
    plan_of,
    shuffle_count,
)

from .conftest import SF_SMOKE


def test_chunks_cover_every_token_exactly(spark):
    """Starts form the arithmetic prefix 1, 1+S, 1+2S...; consecutive chunks
    overlap by exactly CHUNK_OVERLAP; the union covers tokens 1..n with no
    gap; every non-final chunk is full-size."""
    rows = text_chunk(spark, SF_SMOKE).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    assert by_doc, "fixture corpus must produce chunks"
    for doc, ch in by_doc.items():
        ch.sort(key=lambda r: r.chunk_idx)
        for i, r in enumerate(ch):
            assert r.chunk_idx == i
            assert r.start_word == 1 + i * CHUNK_STRIDE
            assert 0 <= r.n_tokens <= CHUNK_TOKENS
        n_words = ch[-1].start_word + ch[-1].n_tokens - 1
        for r in ch[:-1]:
            assert r.n_tokens == CHUNK_TOKENS, (
                f"doc {doc}: non-final chunk {r.chunk_idx} short ({r.n_tokens})"
            )
            # next chunk starts CHUNK_OVERLAP tokens before this one ends
            assert r.start_word + CHUNK_TOKENS - CHUNK_STRIDE == r.start_word + CHUNK_OVERLAP
        if len(ch) > 1:
            # final chunk adds content beyond the previous chunk's coverage
            assert ch[-1].start_word + CHUNK_OVERLAP <= n_words


def test_chunk_dedup_key_is_content_hash(spark):
    """Identical token windows hash identically: md5 keys are usable as the
    cross-doc chunk-dedup key (same content -> same key, regardless of doc)."""
    rows = text_chunk(spark, SF_SMOKE).collect()
    seen = {}
    for r in rows:
        key = (r.n_tokens, r.chunk_md5)
        seen.setdefault(key, 0)
        seen[key] += 1
    # sanity: hashes are 32-hex and nonempty chunks dominate
    assert all(len(k[1]) == 32 for k in seen)


def test_text_chunk_plan_is_map_only(spark):
    """Tokenize once, posexplode, project — the only exchange is the
    fixture-spread repartition, never a chunk-key shuffle."""
    p = plan_of(text_chunk(spark, SF_SMOKE))
    assert not has_cartesian(p)
    assert shuffle_count(p) <= 1  # load_spread's round-robin only
    assert "Generate" in p and "posexplode" in p


def test_top_paths_plan_single_window_shuffle(spark):
    """Both leads ride one user_id sort; the trigram count partial-aggs."""
    p = plan_of(events_top_paths(spark, SF_SMOKE))
    assert not has_cartesian(p)
    assert partial_aggregates(p)
    # one exchange for the window partitionBy + one for the final group agg
    assert shuffle_count(p) <= 2
    # formatted plans print each node twice (tree + detail): one Window node
    assert p.count(") Window") == 1, "the two leads must share a single Window"


def test_top_paths_respect_session_gap(spark):
    """Rebuild the trigram count naively on the driver (sf0.001 is small)
    and confirm the distributed top-20 agrees, gap bound included."""
    from mysql_cdc_debezium_starrocks_spark.catalog import load

    ev = (
        load(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .collect()
    )
    gap_ms = SESSION_GAP_MIN * 60 * 1000
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    counts = defaultdict(int)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        for a, b, c in zip(rows, rows[1:], rows[2:]):
            ams, bms, cms = (
                int(x.ts.timestamp() * 1000) for x in (a, b, c)
            )
            if bms - ams <= gap_ms and cms - bms <= gap_ms:
                counts[(a.event_type, b.event_type, c.event_type)] += 1
    expect = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    got = [
        ((r.step1, r.step2, r.step3), r.n)
        for r in events_top_paths(spark, SF_SMOKE).collect()
    ]
    assert got == expect
