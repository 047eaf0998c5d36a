"""Shared helpers for the batch-keyed state layout every incremental
streaming module uses (``<state>/<sub>/batch=<id>`` contribution dirs,
``v=<id>`` baseline versions).

One definition instead of a per-module copy: a future layout change
(object storage, different dir scheme) lands here once.
"""

from __future__ import annotations

import os
import re


def numbered_ids(root: str, prefix: str = "batch") -> list[int]:
    """Sorted numeric ids of ``<prefix>=<n>`` children of ``root``.

    Missing ``root`` means no state yet -> [].  Non-matching entries
    (tmp dirs, _SUCCESS files, foreign partitions) are ignored.
    """
    if not os.path.isdir(root):
        return []
    pat = re.compile(re.escape(prefix) + r"=(\d+)")
    return sorted(
        int(m.group(1)) for d in os.listdir(root) if (m := pat.fullmatch(d))
    )
