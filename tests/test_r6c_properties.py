"""Pure-python property tests for the round-6 closed-form algebra — the
parts whose CORRECTNESS lives in arithmetic identities, not in Spark
plumbing (which the fixture equivalence tests already pin):

1. the interval-overlap sweep-line identities
   (operators/temporal.py::join_interval_overlap):
     n_pairs          == sum over starts of live intervals
     sum_overlap_days == sum over days of C(coverage, 2)
     max_overlap_days == max over rows of min(e, prefix-max-e) - s + 1
   against an O(n^2) brute force over adversarial random interval sets
   (equal starts, equal ends, touching endpoints, singletons);

2. the CUSUM carry algebra (streaming/cusum_ingest.py): folding the
   series through ARBITRARY batch boundaries with the
   (prefix_end, min_prefix) carry yields exactly the unsplit textbook
   recursion s_t = max(0, s_{t-1} + d_t), for any integer step sequence
   and any split.

No SparkSession: these mirror the integer arithmetic the SQL executes
(the fixture tests prove the SQL mirrors this python), so hypothesis can
afford hundreds of examples.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

# --- 1. interval sweep-line --------------------------------------------------

intervals = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 8)),  # (start, len-1..8)
    min_size=1,
    max_size=40,
)


def _brute(iv):
    """O(n^2) ground truth over closed integer intervals [s, e]."""
    n_pairs = 0
    sum_days = 0
    max_days = 0
    for i in range(len(iv)):
        for j in range(i + 1, len(iv)):
            (sa, ea), (sb, eb) = iv[i], iv[j]
            if sa <= eb and sb <= ea:
                ov = min(ea, eb) - max(sa, sb) + 1
                n_pairs += 1
                sum_days += ov
                max_days = max(max_days, ov)
    return n_pairs, sum_days, max_days


def _sweep(iv):
    """The three closed forms exactly as the Spark windows compute them."""
    # event sweep: starts before ends on value ties, then by row id
    events = []
    for rid, (s, e) in enumerate(iv):
        events.append((s, 0, rid))
        events.append((e, 1, rid))
    events.sort()
    starts_before = ends_before = 0
    n_pairs = 0
    for _val, typ, _rid in events:
        if typ == 0:
            n_pairs += starts_before - ends_before
            starts_before += 1
        else:
            ends_before += 1

    # per-day coverage
    cov = defaultdict(int)
    for s, e in iv:
        for d in range(s, e + 1):
            cov[d] += 1
    sum_days = sum(c * (c - 1) // 2 for c in cov.values())

    # running max of prefix ends over (s, rid) order
    max_days = 0
    best_e = None
    for s, e in sorted(
        ((s, e) for s, e in iv), key=lambda p: p
    ):
        if best_e is not None and best_e >= s:
            max_days = max(max_days, min(e, best_e) - s + 1)
        best_e = e if best_e is None else max(best_e, e)
    return n_pairs, sum_days, max_days


@settings(max_examples=400, deadline=None)
@given(intervals)
def test_interval_sweep_identities(raw):
    iv = [(s, s + ln) for s, ln in raw]
    assert _sweep(iv) == _brute(iv)


def test_interval_sweep_edge_cases():
    # touching endpoints overlap (closed intervals); nested; identical;
    # equal starts; chains
    cases = [
        [(0, 5), (5, 9)],            # touch at one day
        [(0, 9), (2, 3)],            # nested
        [(4, 6), (4, 6), (4, 6)],    # identical triple
        [(0, 3), (0, 7), (0, 1)],    # equal starts
        [(0, 1), (2, 3), (4, 5)],    # disjoint chain
        [(0, 0), (0, 0)],            # degenerate points
    ]
    for iv in cases:
        assert _sweep(iv) == _brute(iv), iv


# --- 2. CUSUM carry algebra --------------------------------------------------

steps = st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=60)


def _recursion(ds):
    s = 0
    out = []
    for d in ds:
        s = max(0, s + d)
        out.append(s)
    return out


def _carried(ds, cuts):
    """Fold through batches delimited by ``cuts`` using the
    (prefix_end, min_prefix) carry exactly as ingest_cusum_batch does."""
    out = []
    c_prefix, c_minp = 0, 0
    bounds = [0] + sorted(cuts) + [len(ds)]
    for lo, hi in zip(bounds, bounds[1:]):
        if lo == hi:
            continue
        run = 0
        for d in ds[lo:hi]:
            run += d
            prefix = c_prefix + run
            # running min folds batch-local prefixes with the carried min
            c_minp = min(c_minp, prefix)
            out.append(prefix - min(c_minp, 0))
        c_prefix = prefix
    return out


@settings(max_examples=400, deadline=None)
@given(
    steps,
    st.lists(st.integers(0, 59), max_size=6),
)
def test_cusum_carry_equals_recursion(ds, cuts):
    cuts = [c for c in cuts if c < len(ds)]
    assert _carried(ds, cuts) == _recursion(ds)


def test_cusum_carry_single_and_per_element_batches():
    ds = [5, -3, -9, 12, -1, -20, 7, 7, 7]
    assert _carried(ds, []) == _recursion(ds)
    assert _carried(ds, list(range(1, len(ds)))) == _recursion(ds)
