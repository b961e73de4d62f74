"""Fused Pallas kernel: dequantize + 8x8 IDCT + level shift + clamp.

TPU-native replacement for the reference's three-pass GL pipeline
(horz*.fs.glsl -> vert.fs.glsl -> un*.fs.glsl with FBO round-trips,
jpeg_gpu.c:1289-1309): one kernel pass in VMEM, no HBM round-trips between
the two separable IDCT passes.

Design (SURVEY.md section 7, hard part 3 -- layout):

The VPU/MXU want (sublane, lane) = (x, 128) tiles, so 8x8 blocks are packed
**256 per tile**: tile[8a+u, 8b+v] = block[16a+b][u, v] -- a 16x16 grid of
blocks inside one (128, 128) tile.  Both IDCT passes then become full-width
128x128 matmuls against *block-diagonal* basis matrices:

    row pass:  Y = X  @ blockdiag(M, 16)     # contract v with M[v, j]
    col pass:  Z = blockdiag(M^T, 16) @ Y    # contract u with M[u, i]

The block-diagonal operands waste 15/16 of the MXU's multiplies on
structural zeros, but decode is HBM-bandwidth-bound (3 bytes/pixel moved vs
>200 available FLOPs/pixel), so trading free FLOPs for full-rate MXU issue
and perfect tiling is the right TPU bargain.  Compare the reference's
per-fragment scalar butterflies (C11-C14) -- the opposite trade for the
opposite hardware.

Dequantization is fused as a broadcast multiply on the way into the first
matmul (the analogue of premultiplying quant into the horizontal pass,
jpeg_gpu.c:1320-1341); +128 level shift and [0,255] clamp are fused on the
way out (vert.fs.glsl:98-101 semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_gpu_tpu.ops.idct import dct_basis

BLOCKS_PER_TILE = 256  # 16 x 16 blocks of 8x8 in a (128, 128) tile
_TILE = 128


@functools.lru_cache()
def _bases():
    m = dct_basis(np.float32)
    bd_m = np.zeros((_TILE, _TILE), np.float32)
    bd_mt = np.zeros((_TILE, _TILE), np.float32)
    for g in range(16):
        bd_m[g * 8 : g * 8 + 8, g * 8 : g * 8 + 8] = m
        bd_mt[g * 8 : g * 8 + 8, g * 8 : g * 8 + 8] = m.T
    return bd_m, bd_mt


def blocks_to_tiles(coefs: jax.Array) -> jax.Array:
    """(B, 8, 8) blocks -> (T, 128, 128) tiles, zero-padded to 256 blocks."""
    b = coefs.shape[0]
    t = -(-b // BLOCKS_PER_TILE)
    pad = t * BLOCKS_PER_TILE - b
    if pad:
        coefs = jnp.pad(coefs, ((0, pad), (0, 0), (0, 0)))
    x = coefs.reshape(t, 16, 16, 8, 8)          # (t, a, b, u, v)
    x = x.transpose(0, 1, 3, 2, 4)              # (t, a, u, b, v)
    return x.reshape(t, _TILE, _TILE)


def tiles_to_blocks(tiles: jax.Array, nblocks: int) -> jax.Array:
    """(T, 128, 128) tiles -> (nblocks, 8, 8), dropping padding."""
    t = tiles.shape[0]
    x = tiles.reshape(t, 16, 8, 16, 8)          # (t, a, u, b, v)
    x = x.transpose(0, 1, 3, 2, 4)              # (t, a, b, u, v)
    return x.reshape(t * BLOCKS_PER_TILE, 8, 8)[:nblocks]


def _kernel(coef_ref, quant_ref, bdm_ref, bdmt_ref, out_ref):
    x = coef_ref[0].astype(jnp.float32) * quant_ref[:]
    y = jax.lax.dot_general(
        x, bdm_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    z = jax.lax.dot_general(
        bdmt_ref[:], y, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    # Mosaic has no f32->u8 cast; round+clamp in f32, hop through i32.
    pix = jnp.clip(jnp.round(z + 128.0), 0.0, 255.0).astype(jnp.int32)
    out_ref[0] = pix.astype(jnp.uint8)


def _dequant_idct_tiles(tiles: jax.Array, qtile: jax.Array, interpret: bool) -> jax.Array:
    t = tiles.shape[0]
    bd_m, bd_mt = _bases()
    grid_spec = pl.GridSpec(
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, _TILE, _TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, _TILE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, _TILE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, _TILE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TILE, _TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, _TILE, _TILE), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * t * _TILE * _TILE * _TILE,
            bytes_accessed=t * _TILE * _TILE * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tiles, qtile, jnp.asarray(bd_m), jnp.asarray(bd_mt))


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def dequant_idct_pixels_fused(
    coefs: jax.Array, qtable: jax.Array, interpret: bool | None = None
) -> jax.Array:
    """Fused dequant+IDCT+shift+clamp over (..., 8, 8) int blocks -> uint8.

    Float path (meets IEEE-1180; not bit-exact vs islow).  Falls back to
    interpreter mode off-TPU so the same code path is testable on CPU.
    """
    if interpret is None:
        interpret = not _on_tpu()
    lead = coefs.shape[:-2]
    nblocks = int(np.prod(lead)) if lead else 1
    tiles = blocks_to_tiles(coefs.reshape(nblocks, 8, 8))
    qtile = jnp.tile(qtable.astype(jnp.float32), (16, 16))
    out_tiles = _dequant_idct_tiles(tiles, qtile, interpret)
    return tiles_to_blocks(out_tiles, nblocks).reshape(*lead, 8, 8)
