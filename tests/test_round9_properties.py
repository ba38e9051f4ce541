"""Round-9 property tests: decoder truncation behavior and the JPEG
baseline decoder (added this round)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def test_png_every_prefix_truncation_is_valueerror():
    """Cutting a valid PNG at EVERY byte offset must raise the documented
    ValueError — never struct.error (round-8 ADVICE: a cut inside a
    chunk's 4-byte CRC field, data fully present, hit the unguarded
    struct.unpack) and never a silent wrong decode."""
    from mapreduce__spark.operators.multimodal import (
        _png_encode,
        decode_png_pixels,
    )

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(3, 5, 3), dtype=np.int64).astype(np.uint8)
    full = _png_encode(rgb)
    want = decode_png_pixels(full)
    assert want[:3] == (5, 3, 15)
    for cut in range(len(full)):
        with pytest.raises(ValueError):
            decode_png_pixels(full[:cut])
