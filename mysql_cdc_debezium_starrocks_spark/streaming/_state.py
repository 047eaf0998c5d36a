"""Shared helpers for the batch-keyed state layout every incremental
streaming module uses (``<state>/<sub>/batch=<id>`` contribution dirs,
``v=<id>`` baseline versions).

One definition instead of a per-module copy: a future layout change
(object storage, different dir scheme) lands here once.
"""

from __future__ import annotations

import json
import os
import re
import shutil


def numbered_ids(
    root: str, prefix: str = "batch", require_marker: str | None = None
) -> list[int]:
    """Sorted NUMERIC ids of ``<prefix>=<n>`` children of ``root``.

    Missing ``root`` means no state yet -> [].  Non-matching entries
    (tmp dirs, _SUCCESS files, foreign partitions) are ignored.  With
    ``require_marker``, only dirs containing that file count (commit
    markers: ``_SUCCESS``, ``_COMMITTED``) — uncommitted crash leftovers
    are invisible to readers.

    Numeric ordering is load-bearing: a lexicographic listdir sort puts
    ``v=9`` after ``v=10`` and would make a baseline reader resurrect an
    old version once ids reach two digits.
    """
    if not os.path.isdir(root):
        return []
    pat = re.compile(re.escape(prefix) + r"=(\d+)")
    return sorted(
        int(m.group(1))
        for d in os.listdir(root)
        if (m := pat.fullmatch(d))
        and (
            require_marker is None
            or os.path.exists(os.path.join(root, d, require_marker))
        )
    )


# ---------------------------------------------------------------------------
# Verbatim contribution folding: the generic retention hook for batch-keyed
# stores whose rows need no re-aggregation (or a schema-preserving one).
# Mirrors agg_mv.compact_agg_mv's committed-baseline scheme so every
# maintainer inherits the same crash-safety argument:
#   <root>/batch=<id>/...            live contribution dirs
#   <root>/baseline/v=<k>/data/...   folded rows
#   <root>/baseline/v=<k>/_FOLDED    JSON manifest of absorbed batch ids
#   <root>/baseline/v=<k>/_COMMITTED marker written LAST — readers only
#                                    trust marked baselines, so a crash
#                                    anywhere mid-fold is invisible
# ---------------------------------------------------------------------------

_FOLDED = "_FOLDED"
_COMMITTED = "_COMMITTED"
_BASELINE = "baseline"


def committed_fold(root: str) -> tuple[str, set[int]] | None:
    """Newest committed baseline under ``root``: (data path, folded ids)."""
    broot = os.path.join(root, _BASELINE)
    ks = numbered_ids(broot, prefix="v", require_marker=_COMMITTED)
    if not ks:
        return None
    d = os.path.join(broot, f"v={ks[-1]}")
    with open(os.path.join(d, _FOLDED)) as f:
        return os.path.join(d, "data"), set(json.load(f))


def read_fold_paths(root: str, before: int | None = None) -> list[str]:
    """Parquet paths covering the store exactly once: the committed
    baseline (if any) plus live batch dirs, optionally only ids strictly
    below ``before`` (the crash-replay read: a replaying batch must not see
    its own or later contributions).

    A folded id >= ``before`` is impossible in a correct deployment —
    folding keeps the newest ``keep_last >= 1`` dirs live and only the
    newest batch can replay — so it raises instead of silently serving a
    store that double-counts the replaying batch.
    """
    base = committed_fold(root)
    folded = base[1] if base else set()
    ids = [i for i in numbered_ids(root) if i not in folded]
    if before is not None:
        if folded and max(folded) >= before:
            raise RuntimeError(
                f"{root}: baseline folded batch ids up to {max(folded)} but "
                f"batch {before} is replaying — compaction ran ahead of the "
                f"checkpoint commit horizon (keep_last too small?)"
            )
        ids = [i for i in ids if i < before]
    paths = [os.path.join(root, f"batch={i}") for i in ids]
    if base:
        paths.append(base[0])
    return paths


def guard_folded_replay(root: str, batch_id: int) -> None:
    """Refuse a replay of a batch id the committed baseline already
    absorbed — rewriting its dir would serve the rows twice (baseline +
    live).  For maintainers whose writer never reads state (so the
    ``read_fold_paths(before=...)`` check never trips)."""
    base = committed_fold(root)
    if base and batch_id in base[1]:
        raise RuntimeError(
            f"{root}: batch {batch_id} already folded into the committed "
            "baseline but is replaying — compaction ran ahead of the "
            "checkpoint commit horizon (keep_last too small?)"
        )


def read_fold_df(spark, root: str, cols: list[str]):
    """The store as ONE DataFrame: live contribution dirs + the committed
    baseline, each read with its own ``basePath`` (required for stores
    whose dirs carry ``key=value`` partition subdirs — a multi-root read
    would trip Spark's conflicting-partition-directories check, and the
    baseline's ``baseline/v=<k>/data`` ancestors would break single-rooted
    discovery), unioned on ``cols``.  Returns None when the store is
    empty.  Partition-column filters prune in every leg."""
    base = committed_fold(root)
    folded = base[1] if base else set()
    ids = [i for i in numbered_ids(root) if i not in folded]
    parts = []
    if ids:
        parts.append(
            spark.read.option("basePath", root)
            .parquet(*[os.path.join(root, f"batch={i}") for i in ids])
            .select(*cols)
        )
    if base:
        parts.append(
            spark.read.option("basePath", base[0]).parquet(base[0]).select(*cols)
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fold_verbatim(
    spark, root: str, keep_last: int = 2, agg=None, partition_by=None
) -> None:
    """Fold all but the newest ``keep_last`` contribution dirs (plus the
    old baseline) into a new committed baseline, then GC what it absorbed.

    ``agg`` (optional) is a schema-preserving DataFrame reducer applied to
    the union before writing (e.g. re-summing a token ledger); default is a
    verbatim row copy.  ``partition_by`` (optional) keeps the baseline laid
    out as ``key=value`` partition dirs so readers that prune on that
    column (the ANN index's bucket pruning) keep pruning the baseline
    exactly like a live contribution dir.  ``keep_last`` must stay >= 1:
    only the newest batch can crash-replay, and its re-read excludes folded
    ids, so the dirs a replay may touch must never be folded.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (replay safety)")
    if not os.path.isdir(root):
        return
    base = committed_fold(root)
    folded = base[1] if base else set()
    live = [i for i in numbered_ids(root) if i not in folded]
    fold = live[:-keep_last]
    if not fold:
        return
    parts = [os.path.join(root, f"batch={i}") for i in fold]
    if base:
        parts.append(base[0])
    # one read per path, each its own basePath: a multi-root read over
    # partitioned contribution dirs (the ANN index's bucket=<b> layout)
    # trips Spark's conflicting-partition-directories check otherwise
    dfs = [spark.read.option("basePath", p).parquet(p) for p in parts]
    merged = dfs[0]
    for d in dfs[1:]:
        merged = merged.unionByName(d)
    if agg is not None:
        merged = agg(merged)
    broot = os.path.join(root, _BASELINE)
    ks = numbered_ids(broot, prefix="v")  # uncommitted leftovers count too:
    new_dir = os.path.join(broot, f"v={(ks[-1] + 1) if ks else 0}")  # no reuse
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(new_dir, "data"))
    with open(os.path.join(new_dir, _FOLDED), "w") as f:
        json.dump(sorted(folded | set(fold)), f)
    with open(os.path.join(new_dir, _COMMITTED), "w") as f:
        f.write("")  # marker LAST
    for p in parts[: len(fold)]:
        shutil.rmtree(p, ignore_errors=True)
    for k in ks:
        shutil.rmtree(os.path.join(broot, f"v={k}"), ignore_errors=True)
