"""Unit tests for the fused pixel kernel's raster-major store helper.

`_interleave_row` turns wpg word-phase tiles (band, hbc) into one
(band, hbc*wpg) raster row with static lane-shuffle gathers, replacing
the post-kernel XLA transpose (the 56%-of-pixel-stage relayout,
docs/ARCHITECTURE.md "Known headroom").  The gather indices/masks are
trace-time constants and the source chunking (hbc > 128 straddles
128-lane gather tiles) is subtle, so it gets direct coverage at shapes
the tiny interpret-mode kernel tests never reach.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from jpeg_gpu_tpu.ops.pixel_fused import _interleave_row


@pytest.mark.parametrize(
    "band,hbc,wpg",
    [
        (8, 15, 6),     # single output tile, tiny image
        (8, 120, 12),   # bench 1080p 4:2:0 shape (single source chunk)
        (8, 128, 6),    # exact chunk boundary
        (8, 240, 12),   # 4K 4:2:2 shape: sources straddle two 128-chunks
        (8, 256, 6),    # max hb_tile, two full chunks
        (16, 130, 12),  # band > 8, just past a chunk boundary
    ],
)
def test_interleave_row_matches_transpose(band, hbc, wpg):
    rng = np.random.default_rng(hbc * wpg + band)
    words = [
        rng.integers(-(2**31), 2**31, size=(band, hbc), dtype=np.int64)
        .astype(np.int32)
        for _ in range(wpg)
    ]
    got = np.asarray(_interleave_row([jnp.asarray(w) for w in words], hbc))
    # Reference: the XLA-transpose semantics, (wpg, hbc) -> (hbc, wpg) flat.
    ref = np.stack(words, axis=1).transpose(0, 2, 1).reshape(band, hbc * wpg)
    np.testing.assert_array_equal(got, ref)
