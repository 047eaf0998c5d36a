"""Image-decode hook: feature-gated codec (round-1 verdict item 7).

The container ships no codec, so the pillow-backed path is exercised only
where pillow exists (skip-if-absent); the absence path must stay a clear,
actionable error — never a silent wrong answer.
"""

from __future__ import annotations

import pytest

from mysql_cdc_debezium_starrocks_spark.operators.multimodal import (
    IMAGE_CODEC_AVAILABLE,
    decode_image,
)


def test_decode_image_absent_path_is_explicit():
    if IMAGE_CODEC_AVAILABLE:
        pytest.skip("codec present; absence path not reachable")
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_decode_image_with_codec():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        np.arange(48, dtype=np.uint8).reshape(4, 4, 3), "RGB"
    ).save(buf, format="PNG")
    arr = decode_image(buf.getvalue())
    assert arr.shape == (4, 4, 3) and arr.dtype == np.uint8
    assert arr[0, 0, 0] == 0 and arr[3, 3, 2] == 47
