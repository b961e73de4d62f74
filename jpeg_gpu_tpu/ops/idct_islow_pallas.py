"""Pallas kernel: bit-exact islow dequant+IDCT in coefficient-plane (SoA)
layout, emitting the raster sample plane.

Status: REFERENCE / BENCHMARK BASELINE.  The production exact RGB path is
the fully fused kernel in ops/pixel_fused.py (which subsumes this design
and adds upsample+color+packing); the XLA islow (ops/idct_islow.py)
serves the YUV stage and non-fused modes.  This standalone kernel ties
the XLA plane path on throughput (both arithmetic-bound) and is kept as
the minimal, self-testing demonstration of the SoA layout -- run
`python -m jpeg_gpu_tpu.ops.idct_islow_pallas` on a TPU.

TPU-first layout insight: an 8x8 block is the WRONG unit for the VPU --
(8, 8) tiles waste 15/16 of every (8, 128) vector register and force lane
shuffles between the two separable passes (the reference's low/high FBO
split, jpeg_gpu.c:827-848, is the GL shape of the same problem).  Instead
the kernel consumes *coefficient planes*: X[j] of shape (vb, hb) holds
natural-order coefficient j of every block.  Both IDCT passes are then
pure elementwise int32 arithmetic over (band, hb) tiles:

  pass 1 (columns): for v in 0..7: idct8(X[v], X[8+v], ..., X[56+v])
  pass 2 (rows):    for u in 0..7: idct8(P[u][0], ..., P[u][7])

-- no transposes, no gathers, no strided access anywhere in the math.
Results leave the kernel as int32 words of four packed u8 samples, with
the pixel row (u) and the even/odd word parity as separate output axes
(Mosaic cannot lower lane/sublane interleaving reshapes); XLA performs
the one remaining minor-axis (2, hb) -> (hb, 2) transpose on the packed
words -- 4x less data than transposing samples.

The device entropy decoder's output is already SoA-shaped (its 64-axis is
separate), so the fully-on-device path reaches this kernel with one cheap
axis permutation in the assembly pass.

Fixed-point arithmetic is identical to ops/idct_islow.py (13-bit
constants, PASS1 descale, final descale) -- bit-exact vs libjpeg-turbo's
JDCT_ISLOW, asserted against the host oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_gpu_tpu.ops.idct_islow import CONST_BITS, PASS1_BITS, _idct8

LANES = 128


def _idct_plane_kernel(
    qtable_ref,   # scalar prefetch: (64,) int32 dequant multipliers
    coef_ref,     # (1, 64, BAND, HB) int32: SoA coefficient planes
    out_ref,      # (1, BAND, 8, 2, HB) int32: packed u8 words; axes =
    #               (block row, pixel row u, even/odd word, block col)
):
    # Dequantize while loading; SMEM scalars broadcast into the multiply.
    x = [coef_ref[0, j] * qtable_ref[j] for j in range(64)]

    # Pass 1: one 8-point IDCT per column phase v, elementwise over tiles.
    p1 = [None] * 64
    for v in range(8):
        cols = [x[u * 8 + v] for u in range(8)]
        outs = _idct8(*cols, descale_bits=CONST_BITS - PASS1_BITS)
        for u in range(8):
            p1[u * 8 + v] = outs[u]

    # Pass 2 + level shift + clamp + byte pack, one pixel row u at a time.
    for u in range(8):
        vals = _idct8(
            *[p1[u * 8 + v] for v in range(8)],
            descale_bits=CONST_BITS + PASS1_BITS + 3,
        )
        y = [jnp.clip(s + 128, 0, 255) for s in vals]
        # Four samples per int32 word, little-endian byte order (matches
        # the uint8 view of the output buffer).
        even = y[0] | (y[1] << 8) | (y[2] << 16) | (y[3] << 24)
        odd = y[4] | (y[5] << 8) | (y[6] << 16) | (y[7] << 24)
        out_ref[0, :, u, 0] = even
        out_ref[0, :, u, 1] = odd


@functools.partial(jax.jit, static_argnums=(2,))
def dequant_idct_islow_plane_soa(
    coefs_soa: jax.Array,   # (..., 64, vb, hb) int32/int16 SoA coefficients
    qtable: jax.Array,      # (64,) or (8, 8) int32 natural-order multipliers
    band: int = 8,          # block rows per grid step
) -> jax.Array:
    """SoA coefficients -> (..., vb*8, hb*8) uint8 samples (bit-exact islow).

    vb must be a multiple of ``band`` (pad with zero blocks; crop after).
    Leading batch dims map onto the grid.
    """
    *lead, sixtyfour, vb, hb = coefs_soa.shape
    assert sixtyfour == 64, coefs_soa.shape
    assert vb % band == 0, (vb, band)
    n = int(np.prod(lead)) if lead else 1
    x = coefs_soa.reshape(n, 64, vb, hb).astype(jnp.int32)
    q = qtable.reshape(64).astype(jnp.int32)

    nbands = vb // band
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nbands),
        in_specs=[
            pl.BlockSpec(
                (1, 64, band, hb),
                lambda ni, bi, *_: (ni, 0, bi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, band, 8, 2, hb),
            lambda ni, bi, *_: (ni, bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    packed = pl.pallas_call(
        _idct_plane_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, vb, 8, 2, hb), jnp.int32),
        interpret=jax.default_backend() == "cpu",
    )(q, x)
    # One minor-axis transpose on packed words (4x less data than pixel
    # samples), then a free reshape to raster and a u8 view.
    words = packed.transpose(0, 1, 2, 4, 3).reshape(n, vb * 8, hb * 2)
    plane = jax.lax.bitcast_convert_type(words, jnp.uint8)
    plane = plane.reshape(n, vb * 8, hb * 8)
    return plane.reshape(*lead, vb * 8, hb * 8) if lead else plane[0]


def blocks_to_soa(coefs: jax.Array) -> jax.Array:
    """(..., vb, hb, 8, 8) -> (..., 64, vb, hb) coefficient planes."""
    *lead, vb, hb, _, _ = coefs.shape
    x = coefs.reshape(*lead, vb, hb, 64)
    return jnp.moveaxis(x, -1, -3)


if __name__ == "__main__":
    # Self-test vs the XLA islow oracle (run on TPU: one risky probe per
    # process).
    import time

    from jpeg_gpu_tpu.ops.idct_islow import dequant_idct_islow_pixels
    from jpeg_gpu_tpu.ops.idct import blocks_to_plane

    rng = np.random.default_rng(0)
    vb, hb = 16, 240
    coefs = rng.integers(-512, 512, size=(vb, hb, 8, 8)).astype(np.int16)
    qt = rng.integers(1, 64, size=(8, 8)).astype(np.int32)

    ref_blocks = dequant_idct_islow_pixels(jnp.asarray(coefs), jnp.asarray(qt))
    ref = np.asarray(blocks_to_plane(ref_blocks))

    soa = blocks_to_soa(jnp.asarray(coefs))
    got = np.asarray(dequant_idct_islow_plane_soa(soa, jnp.asarray(qt)))
    np.testing.assert_array_equal(got, ref)
    print("islow SoA Pallas kernel: bit-exact OK", got.shape)
