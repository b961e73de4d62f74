"""The jitted device pipeline: coefficient tensors -> pixels, one XLA program.

Replaces the reference's three GL passes + FBO plumbing (jpeg_gpu.c:759-1119)
with a single jitted function per (geometry, stage): dequant -> IDCT ->
block-to-plane -> chroma upsample -> color convert, all fused by XLA with no
host round-trip.  Geometry is static (JPEG dims vary -> one compile per
geometry bucket, cached by jit on the hashable PipelineSpec).

Every op accepts leading batch dimensions, so batched decode of
same-geometry images is the same program with ``coefs`` shaped
``(N, vb, hb, 8, 8)``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from jpeg_gpu_tpu.engine.stages import OutputStage
from jpeg_gpu_tpu.info import JpegHeader
from jpeg_gpu_tpu.ops import color as color_ops
from jpeg_gpu_tpu.ops import idct as idct_ops
from jpeg_gpu_tpu.ops import idct_islow


@dataclasses.dataclass(frozen=True)
class PipelineSpec:
    """Static decode geometry (hashable -> one XLA program per spec)."""

    width: int
    height: int
    comp_sizes: Tuple[Tuple[int, int], ...]  # per comp (width, height) in samples
    comp_decs: Tuple[Tuple[int, int], ...]   # per comp (xdec, ydec)
    comp_samps: Optional[Tuple[Tuple[int, int], ...]] = None  # (hsamp, vsamp)
    exact: bool = True                        # islow+int color vs float fast path
    use_pallas: bool = True                   # fused Pallas kernel on the fast path
    upsample: str = "nearest"                 # "nearest" (reference semantics,
    #   do_fancy_upsampling=FALSE) or "fancy" (libjpeg default, bit-exact
    #   vs libjpeg-turbo RGB for every supported subsampling)

    @classmethod
    def from_header(
        cls,
        header: JpegHeader,
        exact: bool = True,
        use_pallas: bool = True,
        upsample: str = "nearest",
    ) -> "PipelineSpec":
        return cls(
            width=header.width,
            height=header.height,
            comp_sizes=tuple((c.width, c.height) for c in header.components),
            comp_decs=tuple((c.xdec, c.ydec) for c in header.components),
            comp_samps=tuple((c.hsamp, c.vsamp) for c in header.components),
            exact=exact,
            use_pallas=use_pallas,
            upsample=upsample,
        )

    @property
    def ncomps(self) -> int:
        return len(self.comp_sizes)


def _sample_planes(spec: PipelineSpec, coefs, qtables):
    """Per-component full (MCU-aligned) sample planes, uint8."""
    planes = []
    for ci in range(spec.ncomps):
        # Both paths emit the raster plane directly: the blocks->plane u8
        # transpose dominated the pipeline when done as a post-pass.
        if spec.exact:
            planes.append(
                idct_islow.dequant_idct_islow_plane(coefs[ci], qtables[ci])
            )
        else:
            planes.append(
                idct_ops.dequant_idct_float_plane(coefs[ci], qtables[ci])
            )
    return planes


@functools.partial(jax.jit, static_argnums=0)
def decode_yuv(spec: PipelineSpec, coefs, qtables):
    """YUV stage: per-component sample planes cropped to true comp dims."""
    planes = _sample_planes(spec, coefs, qtables)
    return tuple(
        p[..., : spec.comp_sizes[ci][1], : spec.comp_sizes[ci][0]]
        for ci, p in enumerate(planes)
    )


@functools.partial(jax.jit, static_argnums=0)
def decode_rgb(spec: PipelineSpec, coefs, qtables):
    """RGB stage: full decode to (..., H, W, 3) uint8.

    Grayscale replicates Y into all three channels (cf. grey.fs display).
    """
    planes = _sample_planes(spec, coefs, qtables)
    h, w = spec.height, spec.width
    if spec.ncomps == 1:
        y = planes[0][..., :h, :w]
        return jnp.broadcast_to(y[..., None], y.shape + (3,))
    if spec.upsample == "fancy":
        # The triangle filters read each chroma plane 3-4 times; without a
        # materialisation point XLA rematerialises the whole chroma IDCT
        # into every tap (measured +38% pipeline time at 8x1080p).
        planes = list(jax.lax.optimization_barrier(tuple(planes)))
    up = []
    for ci, p in enumerate(planes):
        xdec, ydec = spec.comp_decs[ci]
        if spec.upsample == "fancy":
            # Padded-plane filters with the true edge clamped in place:
            # everything stays MCU-aligned (cropping first, then
            # edge-padding odd shapes, measured ~35% slower end to end).
            cw, ch = spec.comp_sizes[ci]
            p = color_ops.upsample_fancy_padded(p, xdec, ydec, cw, ch)
        else:
            p = color_ops.upsample_nearest(p, xdec, ydec)
        up.append(p[..., :h, :w])
    y, cb, cr = up
    if spec.exact:
        return color_ops.ycbcr_to_rgb_exact(y, cb, cr)
    return color_ops.ycbcr_to_rgb_float(y, cb, cr)


def fused_rgb_geometry(spec: PipelineSpec):
    """(sx, sy) for the fused SoA RGB kernel, or None when not applicable.

    The fused path covers the exact RGB decode of 3-component images
    whose chroma planes share one decimation (all six standard
    subsampling modes), for BOTH upsample modes: nearest is static phase
    selection; fancy runs the bit-exact triangle filters in-kernel
    (pixel_fused.py) when the width fits one horizontal tile.  Interpret
    mode (CPU backend) is excluded -- the 4000-op kernel body is
    impractically slow to emulate; the unfused XLA pipeline produces
    bit-identical pixels there.
    """
    if spec.ncomps != 3 or not spec.exact or not spec.use_pallas:
        return None
    if spec.upsample not in ("nearest", "fancy"):
        return None
    if jax.default_backend() == "cpu":
        return None
    (xd0, yd0), c1, c2 = spec.comp_decs
    if (xd0, yd0) != (0, 0) or c1 != c2:
        return None
    sx, sy = 1 << c1[0], 1 << c1[1]
    if sx not in (1, 2, 4) or sy not in (1, 2):
        return None
    # Fancy's in-kernel triangle filters run at ANY width: past one
    # 256-lane h-tile the 2 seam columns per tile boundary are repaired
    # post-kernel with the unfused filters (decode_rgb_soa).
    # The SoA plane shapes are built from the raw sampling factors, so the
    # kernel's layout assumption is luma (sx, sy) and chroma (1, 1) exactly
    # -- decimations alone cannot distinguish e.g. 2x2/2x2/2x2 (all-zero
    # decs, a legal frame) from true 4:4:4.
    if spec.comp_samps is None:
        return None
    if spec.comp_samps[0] != (sx, sy):
        return None
    if spec.comp_samps[1] != (1, 1) or spec.comp_samps[2] != (1, 1):
        return None
    return sx, sy


@functools.partial(jax.jit, static_argnums=(0, 1))
def decode_rgb_soa(spec: PipelineSpec, geom, comps_soa, qtables):
    """Fused RGB decode from parity-split SoA coefficient planes.

    ``comps_soa`` is assemble_components(..., soa=True) output: luma
    (sy, sx, 64, vbC, hbC), chroma (1, 1, 64, vbC, hbC) -- optional
    leading batch dims.  Bit-identical to decode_rgb (asserted on real
    hardware in ops/pixel_fused.py's self-test and tests).
    """
    from jpeg_gpu_tpu.ops import pixel_fused

    sx, sy = geom
    # Materialise the (possibly assembly-produced) planes before the
    # Pallas call: letting XLA schedule the assembly transposes against
    # the kernel's operand copies measured ~3% slower on the full path.
    comps_soa = jax.lax.optimization_barrier(tuple(comps_soa))
    y_soa, cb_soa, cr_soa = comps_soa
    *lead, _, _, _, vbc, hbc = cb_soa.shape
    cb = cb_soa.reshape(*lead, 64, vbc, hbc)
    cr = cr_soa.reshape(*lead, 64, vbc, hbc)
    qty = qtables[0].reshape(-1, 64)
    qtc = jnp.stack(
        [qtables[1].reshape(-1, 64), qtables[2].reshape(-1, 64)], axis=1
    )
    # Fancy differs from nearest only for the true 2x modes; (1,1) is an
    # identity either way and 4:1:1 fancy is replication by definition.
    fancy = spec.upsample == "fancy" and (sx, sy) in ((2, 2), (2, 1), (1, 2))
    rgb = pixel_fused.decode_rgb_fused_soa(
        y_soa, cb, cr, qty, qtc, sx, sy,
        fancy=fancy,
        chroma_true=spec.comp_sizes[1] if fancy else None,
    )
    rgb = rgb[..., : spec.height, : spec.width, :]
    if fancy:
        seam_cols = pixel_fused.fancy_seam_columns(hbc, sx, spec.width)
        if seam_cols:
            rgb = _repair_fancy_seams(
                spec, sx, sy, y_soa, cb, cr, qtables, rgb, seam_cols
            )
    return rgb


def _repair_fancy_seams(spec, sx, sy, y_soa, cb, cr, qtables, rgb, seam_cols):
    """Recompute the fused fancy kernel's per-seam wrong columns exactly.

    The kernel's horizontal triangle filter cannot cross 256-lane h-tile
    seams, so output columns ``seam_cols`` (2 per seam) computed with a
    locally-replicated edge.  For each seam, decode a 4-chroma-block-wide
    strip around it through the UNFUSED pipeline (whose filters see the
    true neighbors; the strip's own replicated edges lie outside the
    pasted columns' filter support) and paste the exact columns back.
    Cost: one (H x 64 px) unfused decode per seam -- noise next to the
    full-frame kernel.
    """
    hbc = cb.shape[-1]
    for t in range(len(seam_cols) // 2):
        seam = seam_cols[2 * t + 1] // (8 * sx)  # chroma lane 256*(t+1)
        c_lo = seam - 2
        c_hi = min(seam + 2, hbc)
        w_blk = c_hi - c_lo
        # SoA slices -> the unfused path's (vb, hb, 8, 8) block layout
        # (the exact inverse of assemble's parity split).
        ys = y_soa[..., c_lo:c_hi]
        *lead, _, _, _, vbc, _ = ys.shape
        nl = len(lead)
        ys = ys.transpose(
            tuple(range(nl)) + (nl + 3, nl, nl + 4, nl + 1, nl + 2)
        )
        y_blocks = ys.reshape(
            tuple(lead) + (vbc * sy, w_blk * sx, 8, 8)
        )
        chroma_blocks = [
            c[..., c_lo:c_hi]
            .transpose(tuple(range(nl)) + (nl + 1, nl + 2, nl))
            .reshape(tuple(lead) + (vbc, w_blk, 8, 8))
            for c in (cb, cr)
        ]
        base_px = c_lo * 8 * sx
        strip_w = min(spec.width - base_px, w_blk * 8 * sx)
        strip_sizes = tuple(
            (min(cw - (base_px >> xd), (w_blk * 8 * sx) >> xd), ch)
            for (cw, ch), (xd, _) in zip(spec.comp_sizes, spec.comp_decs)
        )
        strip_spec = dataclasses.replace(
            spec, width=strip_w, comp_sizes=strip_sizes
        )
        strip_rgb = decode_rgb.__wrapped__(
            strip_spec, (y_blocks,) + tuple(chroma_blocks), qtables
        )
        cols = seam_cols[2 * t : 2 * t + 2]
        rel = [c - base_px for c in cols]
        rgb = rgb.at[..., :, cols, :].set(strip_rgb[..., :, rel, :])
    return rgb


@functools.partial(jax.jit, static_argnums=0)
def decode_dct(spec: PipelineSpec, coefs, qtables):
    """DCT stage: dequantized coefficients, int32 (cf. the dct upload mode)."""
    return tuple(
        coefs[ci].astype(jnp.int32) * qtables[ci].astype(jnp.int32)
        for ci in range(spec.ncomps)
    )


def run(
    spec: PipelineSpec,
    stage: OutputStage,
    coefs: Sequence[jax.Array],
    qtables: Sequence[jax.Array],
):
    """Dispatch one decode through the device pipeline at the given cut."""
    coefs = tuple(coefs)
    qtables = tuple(qtables)
    if stage == OutputStage.QUANT:
        return coefs
    if stage == OutputStage.DCT:
        return decode_dct(spec, coefs, qtables)
    if stage == OutputStage.YUV:
        return decode_yuv(spec, coefs, qtables)
    if stage == OutputStage.RGB:
        return decode_rgb(spec, coefs, qtables)
    raise ValueError(f"stage {stage} not handled by the coefficient pipeline")
