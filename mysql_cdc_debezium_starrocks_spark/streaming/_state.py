"""Shared helpers for the batch-keyed state layout every incremental
streaming module uses (``<state>/<sub>/batch=<id>`` contribution dirs,
``v=<id>`` baseline versions).

One definition instead of a per-module copy: a future layout change
(object storage, different dir scheme) lands here once.
"""

from __future__ import annotations

import os
import re


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
