"""Chroma upsampling + YCbCr -> RGB conversion.

TPU-native replacement for the reference's final GL passes: the display
shaders' nearest-neighbor upsample + JFIF color matrix (yuv.fs.glsl:11-23,
unyuv.fs.glsl:12-49) and libjpeg's pinned ``do_fancy_upsampling=FALSE``
replication mode (jpeg_wrap.c:171-178).

Two conversion paths:

* :func:`ycbcr_to_rgb_exact` -- libjpeg-compatible fixed-point arithmetic
  (16-bit scaled constants, per-term rounding structure of the standard
  table-driven converter), bit-exact vs libjpeg's RGB output.
* :func:`ycbcr_to_rgb_float` -- plain float JFIF matrix as the shaders use
  ([1.402, -0.34414, -0.71414, 1.772], yuv.fs.glsl:11-15); fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SCALEBITS = 16
ONE_HALF = 1 << (SCALEBITS - 1)
# FIX(x) = round(x * 2^16) of the JFIF constants.
FIX_1_40200 = 91881
FIX_0_34414 = 22554
FIX_0_71414 = 46802
FIX_1_77200 = 116130


def upsample_nearest(plane: jax.Array, xdec: int, ydec: int, xp=jnp) -> jax.Array:
    """Replicate a chroma plane 2^xdec x 2^ydec (the `s >> xdec` semantics)."""
    if ydec:
        plane = xp.repeat(plane, 1 << ydec, axis=-2)
    if xdec:
        plane = xp.repeat(plane, 1 << xdec, axis=-1)
    return plane


def ycbcr_to_rgb_exact(
    y: jax.Array, cb: jax.Array, cr: jax.Array, xp=jnp
) -> jax.Array:
    """Fixed-point YCbCr->RGB, bit-exact vs libjpeg's integer converter.

    Per-channel rounding mirrors the table-driven structure: R and B round
    their single chroma product; G sums both products with one rounding
    constant folded into the Cr term.  ``xp`` selects jnp or numpy.
    """
    yi = y.astype(xp.int32)
    cbi = cb.astype(xp.int32) - 128
    cri = cr.astype(xp.int32) - 128
    r = yi + ((FIX_1_40200 * cri + ONE_HALF) >> SCALEBITS)
    b = yi + ((FIX_1_77200 * cbi + ONE_HALF) >> SCALEBITS)
    g = yi + ((-FIX_0_34414 * cbi + (-FIX_0_71414 * cri + ONE_HALF)) >> SCALEBITS)
    rgb = xp.stack([r, g, b], axis=-1)
    return xp.clip(rgb, 0, 255).astype(xp.uint8)


def ycbcr_to_rgb_float(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """Float JFIF conversion (fast path; matches the GLSL matrix)."""
    yf = y.astype(jnp.float32)
    cbf = cb.astype(jnp.float32) - 128.0
    crf = cr.astype(jnp.float32) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.34414 * cbf - 0.71414 * crf
    b = yf + 1.772 * cbf
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.uint8)
