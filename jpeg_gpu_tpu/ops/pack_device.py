"""Device expander for the PACK stage: (run,value) streams -> dense coefs.

TPU-native replacement for the reference's pack-mode entry shaders
(horz_pack_*.fs.glsl): the host uploads only the run-length packed entropy
symbols (the reference's minimal-upload experiment, README.md:18-20,
jpeg_gpu.c:1287) and the device expands them to dense coefficients.

Stream format per block mirrors xjpeg's packed layout (xjpeg.c:484-535):
a u16 ``DC & 0xfff`` entry (absolute DC -- prediction already applied, so
blocks are position-independent), then ``run<<12 | value&0xfff`` per
non-zero AC, then ``0x0000`` as EOB (omitted when the block fills to 63).
Unlike the reference's per-fragment stream walk (which re-reads each
block's stream 8x, C13 note in SURVEY.md), each block is expanded exactly
once.

Kernel shape: identical lockstep architecture to the device entropy
decoder (1024 lanes, block-lockstep grid, masked fori, one-hot
accumulate), but symbols are fixed 16-bit entries -- no Huffman tables, no
variable-length window juggling.  The host splits blocks into pseudo-
segments of K MCUs per lane (host/pack_plan.py); no restart markers are
required, so this path covers streams the device entropy decoder cannot.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_gpu_tpu.ops.entropy_device import (
    LANES,
    SEG_SHAPE,
    SUBLANES,
    _lsr,
)
from jpeg_gpu_tpu.ops.zigzag import DEZIGZAG


def _pack_kernel(
    stream_ref,   # (1, NW, 8, 128) int32: two u16 entries per word, MSB first
    out_ref,      # (1, 1, 64, 8, 128) int16
    state_ref,    # (2, 8, 128) int32: wp (word pos), half (0 = high half next)
):
    t = pl.program_id(1)
    nw = stream_ref.shape[1]

    @pl.when(t == 0)
    def _init():
        state_ref[:] = jnp.zeros((2,) + SEG_SHAPE, jnp.int32)

    wp = state_ref[0]
    half = state_ref[1]

    def fetch_word(wp):
        if nw <= 64:
            acc = jnp.zeros(SEG_SHAPE, jnp.int32)
            for w in range(nw):
                acc = jnp.where(wp == w, stream_ref[0, w], acc)
            return acc

        def body(w, acc):
            return jnp.where(wp == w, stream_ref[0, w], acc)
        return jax.lax.fori_loop(0, nw, body, jnp.zeros(SEG_SHAPE, jnp.int32))

    def next_entry(wp, half, active):
        """Read the next u16 entry for active lanes; advance positions."""
        word = fetch_word(wp)
        entry = jnp.where(half == 0, _lsr(word, 16), word & 0xFFFF)
        wp = jnp.where(active, wp + half, wp)          # advance after low half
        half = jnp.where(active, 1 - half, half)
        return entry, wp, half

    def sign12(v):
        """12-bit two's complement -> int32."""
        return jnp.where(v >= 0x800, v - 0x1000, v)

    iota64 = jax.lax.broadcasted_iota(jnp.int32, (64,) + SEG_SHAPE, 0)
    always = jnp.ones(SEG_SHAPE, jnp.bool_)

    # DC entry: absolute quantized DC in 12-bit two's complement.
    entry, wp, half = next_entry(wp, half, always)
    dc = sign12(entry & 0xFFF)
    acc = jnp.where(iota64 == 0, dc[None], 0).astype(jnp.int32)

    def ac_body(_, carry):
        wp, half, k, active, acc = carry
        act = active > 0
        entry, wp, half = next_entry(wp, half, act)
        is_eob = entry == 0
        run = _lsr(entry, 12)
        val = sign12(entry & 0xFFF)
        newk = k + run + 1
        ok = jnp.logical_and(act, jnp.logical_not(is_eob))
        write = jnp.logical_and(ok, newk <= 63)
        acc = acc + jnp.where(
            jnp.logical_and(iota64 == newk[None], write[None]), val[None], 0
        )
        k = jnp.where(ok, jnp.minimum(newk, 63), k)
        still = jnp.logical_and(ok, k < 63)
        return wp, half, k, still.astype(jnp.int32), acc

    k0 = jnp.zeros(SEG_SHAPE, jnp.int32)
    wp, half, _, _, acc = jax.lax.fori_loop(
        0, 63, ac_body, (wp, half, k0, jnp.ones(SEG_SHAPE, jnp.int32), acc)
    )

    # De-zig-zag as a static row permutation (no captured constants).
    out_ref[0, 0] = jnp.stack([acc[int(z)] for z in DEZIGZAG]).astype(jnp.int16)
    state_ref[0] = wp
    state_ref[1] = half


def expand_pack_device(
    streams: jax.Array,  # (B, NW, 8, 128) int32
    blocks_per_segment: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Expand packed streams -> (B, T, 64, 8, 128) int16 natural-order coefs."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, nw = streams.shape[0], streams.shape[1]
    t = blocks_per_segment
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(
                (1, nw, SUBLANES, LANES),
                lambda bi, ti: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 64, SUBLANES, LANES),
            lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((2, SUBLANES, LANES), jnp.int32)],
    )
    return pl.pallas_call(
        _pack_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, 64, SUBLANES, LANES), jnp.int16),
        interpret=interpret,
    )(streams)
