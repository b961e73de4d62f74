"""Fused Pallas dequant+IDCT kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jpeg_gpu_tpu.ops import idct as idct_ops
from jpeg_gpu_tpu.ops import idct_pallas


def test_tile_layout_round_trip():
    rng = np.random.default_rng(0)
    blocks = rng.integers(-2048, 2048, size=(777, 8, 8), dtype=np.int16)
    tiles = idct_pallas.blocks_to_tiles(jnp.asarray(blocks))
    assert tiles.shape == (4, 128, 128)
    back = np.asarray(idct_pallas.tiles_to_blocks(tiles, 777))
    np.testing.assert_array_equal(back, blocks)


def test_tile_layout_packing():
    """tile[8a+u, 8b+v] == block[16a+b][u, v]."""
    blocks = np.arange(256 * 64, dtype=np.int16).reshape(256, 8, 8)
    tiles = np.asarray(idct_pallas.blocks_to_tiles(jnp.asarray(blocks)))
    for a, b, u, v in [(0, 0, 0, 0), (3, 7, 2, 5), (15, 15, 7, 7), (1, 0, 4, 3)]:
        assert tiles[0, 8 * a + u, 8 * b + v] == blocks[16 * a + b, u, v]


def test_fused_kernel_matches_xla_float_path():
    rng = np.random.default_rng(1)
    coefs = rng.integers(-300, 300, size=(300, 8, 8), dtype=np.int16)
    q = rng.integers(1, 50, size=(8, 8)).astype(np.int32)
    got = np.asarray(
        idct_pallas.dequant_idct_pixels_fused(
            jnp.asarray(coefs), jnp.asarray(q), interpret=True
        )
    )
    ref = np.asarray(idct_ops.dequant_idct_pixels(jnp.asarray(coefs), jnp.asarray(q)))
    # Same math modulo matmul association order; 1 LSB slack.
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
