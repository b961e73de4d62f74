"""Fully fused Pallas pixel kernel: SoA coefficients -> packed RGB bytes.

One kernel pass replaces the whole exact pixel pipeline (dequant + islow
IDCT + nearest chroma upsample + YCbCr->RGB + byte interleave) for the
nearest-upsample path -- the reference needs three GL passes plus FBO
round-trips for the same span (jpeg_gpu.c:1289-1309), and the unfused XLA
pipeline pays ~1 ms of HBM materialisation between stages at 8x1080p.

Everything is elementwise on (band, hbC) int32 tiles, by layout choice:

* Coefficients arrive as *parity-split coefficient planes*:
  luma (sy, sx, 64, vbC, hbC) -- plane [pr, pc, j] holds natural-order
  coefficient j of luma block (sy*i + pr, sx*k + pc) at tile position
  (i, k).  Chroma is unsplit (64, vbC, hbC).  Splitting by block parity
  aligns every luma tile with its chroma tile LANE FOR LANE, so
* nearest chroma upsampling is *static phase selection*: luma pixel
  (8*pr+u, 8*pc+v) of parity (pr, pc) reads chroma phase
  ((8*pr+u)//sy, (8*pc+v)//sx) -- an index computed at trace time, never
  a gather or a lane shuffle;
* the RGB interleave is byte-packing arithmetic: each group of 4 pixels'
  12 channel-bytes packs into 3 int32 words (little-endian), emitted on a
  separate 3*sx*8/4-deep word-phase axis; XLA performs the one remaining
  minor-axis transpose on packed words (1/4 of the sample count).

Arithmetic is bit-exact islow + libjpeg integer color (same fixed-point
ops as ops/idct_islow.py and ops/color.py); samples clamp to u8 before
color exactly as libjpeg's pipeline stores them.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_gpu_tpu.ops.color import (
    FIX_0_34414,
    FIX_0_71414,
    FIX_1_40200,
    FIX_1_77200,
    ONE_HALF,
    SCALEBITS,
)
from jpeg_gpu_tpu.ops.idct_islow import CONST_BITS, PASS1_BITS, _idct8


# Trace-time ablation switches (scripts / perf archaeology only, like
# ops/entropy_device.py): JPEG_TPU_PIXEL_ABLATE=noidct skips the IDCT
# butterflies, =nocolor skips the color convert + byte pack.  Output is
# garbage under ablation; never set in tests.
_ABLATE = frozenset(
    t for t in os.environ.get("JPEG_TPU_PIXEL_ABLATE", "").split(",") if t
)


def _idct_block_planes(load, qfn):
    """64 coefficient planes -> {(u, v): clipped u8-range sample planes}.

    Loads may be int16 (the entropy decoders' native coefficient width);
    the upcast happens here, per tile in VMEM, so the int32 copies never
    materialise in HBM (half the kernel's input bandwidth).
    """
    x = [load(j).astype(jnp.int32) * qfn(j) for j in range(64)]
    if "noidct" in _ABLATE:
        return {(u, v): jnp.clip(x[u * 8 + v], 0, 255) for u in range(8) for v in range(8)}
    p1 = {}
    for v in range(8):
        outs = _idct8(
            *[x[u * 8 + v] for u in range(8)],
            descale_bits=CONST_BITS - PASS1_BITS,
        )
        for u in range(8):
            p1[(u, v)] = outs[u]
    y = {}
    for u in range(8):
        outs = _idct8(
            *[p1[(u, v)] for v in range(8)],
            descale_bits=CONST_BITS + PASS1_BITS + 3,
        )
        for v in range(8):
            y[(u, v)] = jnp.clip(outs[v] + 128, 0, 255)
    return y


def _clamp_chroma_samples(P, band, bi, lb, ue, ve, glane, last_lane):
    """Edge-replicate SAMPLE planes beyond the true chroma dims in place.

    ``P`` maps (u, v) to (band+2, hbc) sample planes (one-block-row halo
    on the sublane axis).  The MCU-padding rows of the partial bottom
    block (global block row ``lb``, sample rows > ``ue``) and the padding
    columns of the GLOBALLY last true lane (``glane`` carries each lane's
    global chroma-block index -- h-tiles see only a slice; sample cols >
    ``ve``) are replaced by the true edge samples -- the padded-plane
    clamp of ops/color.py's *_padded filters, done on the IDCT outputs
    (clamping coefficients would corrupt the whole block's spectrum).
    """
    if ue < 7:
        # Global block row of each tile row (halo offset -1).
        rows = bi * band + jax.lax.broadcasted_iota(
            jnp.int32, P[(0, 0)].shape, 0
        ) - 1
        rowmask = rows == lb
        for u in range(ue + 1, 8):
            for v in range(8):
                P[(u, v)] = jnp.where(rowmask, P[(ue, v)], P[(u, v)])
    if ve < 7:
        lanemask = glane == last_lane
        for u in range(8):
            for v in range(ve + 1, 8):
                P[(u, v)] = jnp.where(lanemask, P[(u, ve)], P[(u, v)])
    return P


def _fancy_chroma_row(P, R, sx, sy, band, mask_first, mask_last, mask_lastlane):
    """Fancy-upsampled chroma values for output pixel row ``R``.

    ``P`` maps (u, v) to (band+2, hbc) sample planes with a one-BLOCK-ROW
    halo on the sublane axis (tile row 0 = previous block row's samples,
    row band+1 = next).  ``mask_first``/``mask_last`` flag the globally
    first/last real block row per (band, hbc) position, where the
    vertical neighbor replicates the edge instead of reading the halo;
    ``mask_lastlane`` flags the GLOBALLY last true chroma block lane,
    whose right neighbor replicates the edge (with h-tiling, the local
    last lane may instead be an interior seam -- its locally-replicated
    value is repaired post-kernel -- or grid padding).
    Returns sx*8 (band, hbc) tiles indexed by output column phase --
    bit-exact ops/color.py triangle-filter arithmetic
    (upsample_fancy_h2/_h2v2).
    """
    def win(u, v, off):
        return P[(u, v)][1 + off : 1 + off + band]

    if sy == 2:
        cu, par = divmod(R, 2)
        # Vertical pass: 10-bit column sums, nearer row x3 + farther.
        if par == 0:
            if cu > 0:
                nb = lambda v: win(cu - 1, v, 0)
            else:
                nb = lambda v: jnp.where(
                    mask_first, win(0, v, 0), win(7, v, -1)
                )
        else:
            if cu < 7:
                nb = lambda v: win(cu + 1, v, 0)
            else:
                nb = lambda v: jnp.where(
                    mask_last, win(7, v, 0), win(0, v, 1)
                )
        cs = [3 * win(cu, v, 0) + nb(v) for v in range(8)]
        if sx == 1:
            # 4:4:0: finish vertically, rounding 1 (even rows) / 2 (odd).
            return [(c + (1 if par == 0 else 2)) >> 2 for c in cs]
        ke, ko, sh = 8, 7, 4  # h2v2 horizontal pass constants
    else:
        cs = [win(R, v, 0) for v in range(8)]
        ke, ko, sh = 1, 2, 2  # h2 on raw samples

    # Horizontal pass: neighbors cross lanes at v=0/7 (adjacent chroma
    # blocks are adjacent lanes); the concat keeps the tile's first/last
    # lane in place, which IS the global edge replication for the first/
    # last tile (seam lanes of interior tiles get the same local
    # replication and are repaired post-kernel).  The globally last TRUE
    # lane must replicate its own edge even when grid-padding lanes
    # follow it in the same tile (their garbage would otherwise feed its
    # odd output phase when ve == 7).
    left = jnp.concatenate([cs[0][:, :1], cs[7][:, :-1]], axis=1)
    right = jnp.concatenate([cs[0][:, 1:], cs[7][:, -1:]], axis=1)
    right = jnp.where(mask_lastlane, cs[7], right)
    out = []
    for c in range(8):
        three = 3 * cs[c]
        lnb = cs[c - 1] if c > 0 else left
        rnb = cs[c + 1] if c < 7 else right
        out.append((three + lnb + ke) >> sh)
        out.append((three + rnb + ko) >> sh)
    return out


def _interleave_row(words, hbc):
    """wpg word-phase tiles (band, hbc) -> one (band, hbc*wpg) raster row.

    Output word position g = l*wpg + w holds words[w][:, l] -- the word-
    phase interleave the post-kernel XLA transpose used to perform
    (measured 1.52 ms of the 2.70 ms pixel stage at 8x1080p: minor-axis
    transposes with a narrow second-minor dim are slow in every engine).
    Building the raster row IN the kernel instead costs one static-index
    lane-shuffle gather per word phase per 128-wide output tile -- the
    indices and phase masks are trace-time constants, and the gathers'
    ~50-cycle latencies overlap across independent output tiles.
    """
    wpg = len(words)
    band = words[0].shape[0]
    total = hbc * wpg
    ntiles = -(-total // 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (band, 128), 1)
    out_tiles = []
    for j in range(ntiles):
        base = 128 * j
        gpos = base + lane         # global output word position
        src = gpos // wpg          # source lane (chroma block column)
        sel = gpos % wpg           # source word phase
        lo = base // wpg
        hi = min((base + 127) // wpg, hbc - 1)
        c0, c1 = lo // 128, hi // 128   # source 128-lane chunk(s)
        acc = None
        for w in range(wpg):
            tile = words[w]

            def gat(c, tile=tile):
                chunk = tile[:, c * 128 : min((c + 1) * 128, hbc)]
                true_w = chunk.shape[1]
                if true_w < 128:
                    # Gather from an exactly-128-lane tile (the shape the
                    # Mosaic lane-shuffle gather is verified on); indices
                    # stay clipped inside the true lanes.
                    chunk = jnp.pad(chunk, ((0, 0), (0, 128 - true_w)))
                idx = jnp.clip(src - c * 128, 0, true_w - 1)
                return jnp.take_along_axis(chunk, idx, axis=1)

            if c0 == c1:
                g = gat(c0)
            else:  # the one tile per row whose sources straddle a chunk
                g = jnp.where(src >= c1 * 128, gat(c1), gat(c0))
            t = jnp.where(sel == w, g, 0)
            acc = t if acc is None else acc | t
        out_tiles.append(acc)
    row = out_tiles[0] if ntiles == 1 else jnp.concatenate(out_tiles, axis=1)
    return row[:, :total] if row.shape[1] != total else row


def _fused_rgb_kernel(
    sx, sy,           # static: luma blocks per chroma block (h, v)
    interleave_store,  # static: raster-major in-kernel store (see above)
    fancy,            # static: None, or the triangle-filter mode's clamp
    #                   geometry (lb, ue, ve, last_block, last_lane):
    #                   partial-bottom-block row, its last true sample
    #                   row, the last true lane's last true sample col,
    #                   last real block row, last true chroma lane
    # scalar prefetch (per image -- grid dim 0 routes batches to tables):
    qty_ref,          # (N, 64) int32 luma dequant
    qtc_ref,          # (N, 2, 64) int32 chroma dequant (Cb, Cr rows)
    # VMEM inputs:
    y_ref,            # (1, sy, sx, 64, BAND, HBC) int16/int32
    cb_ref,           # (1, 64, BAND, HBC); fancy: (1, 64, 1, BAND+2, HBC)
    cr_ref,           # (1, 64, BAND, HBC); fancy: (1, 64, 1, BAND+2, HBC)
    # output:
    out_ref,          # (1, BAND, sy, 8, WPG, HBC) int32 packed RGB words
    #                   (WPG = 6*sx words per chroma-block lane per row);
    #                   interleave_store: (1, BAND, sy, 8, WPG*HBC) raster
):
    ni = pl.program_id(0)
    band = out_ref.shape[1]
    if "noio" in _ABLATE:
        # Pure block-DMA machinery: no loads, constant stores.
        out_ref[:] = jnp.zeros(out_ref.shape, jnp.int32)
        return
    if fancy:
        cb = _idct_block_planes(
            lambda j: cb_ref[0, j, 0], lambda j: qtc_ref[ni, 0, j]
        )
        cr = _idct_block_planes(
            lambda j: cr_ref[0, j, 0], lambda j: qtc_ref[ni, 1, j]
        )
    else:
        cb = _idct_block_planes(
            lambda j: cb_ref[0, j], lambda j: qtc_ref[ni, 0, j]
        )
        cr = _idct_block_planes(
            lambda j: cr_ref[0, j], lambda j: qtc_ref[ni, 1, j]
        )

    # Chroma color terms.  Nearest: once per chroma phase (reused by
    # sx*sy pixels).  Fancy: per output pixel phase (every output pixel
    # has a distinct upsampled chroma value) -- computed per output row
    # from the triangle-filtered values.
    rterm, gterm, bterm = {}, {}, {}
    if not fancy:
        for k in cb:
            cbi = cb[k] - 128
            cri = cr[k] - 128
            rterm[k] = (FIX_1_40200 * cri + ONE_HALF) >> SCALEBITS
            gterm[k] = (
                -FIX_0_34414 * cbi + (-FIX_0_71414 * cri + ONE_HALF)
            ) >> SCALEBITS
            bterm[k] = (FIX_1_77200 * cbi + ONE_HALF) >> SCALEBITS

    wpg = 6 * sx  # words per (chroma lane, pixel row): sx*8 px * 3 / 4

    if fancy:
        lb, ue, ve, last_block, last_lane = fancy
        bi = pl.program_id(1)
        hb_tile = cb_ref.shape[-1]
        # Global chroma-block lane offset of this h-tile (the per-sample
        # planes only see a hb_tile-wide slice of the lane axis).
        lane0 = pl.program_id(2) * hb_tile
        glane_halo = lane0 + jax.lax.broadcasted_iota(
            jnp.int32, (band + 2, hb_tile), 1
        )
        cb = _clamp_chroma_samples(
            cb, band, bi, lb, ue, ve, glane_halo, last_lane
        )
        cr = _clamp_chroma_samples(
            cr, band, bi, lb, ue, ve, glane_halo, last_lane
        )
        rows2d = bi * band + jax.lax.broadcasted_iota(
            jnp.int32, (band, hb_tile), 0
        )
        mask_first = rows2d == 0
        mask_last = rows2d == last_block
        mask_lastlane = (
            lane0
            + jax.lax.broadcasted_iota(jnp.int32, (band, hb_tile), 1)
        ) == last_lane

    for pr in range(sy):
        if fancy:
            # Terms per output pixel phase of THIS row group only (keeps
            # the live-tile count bounded; each term is used once).
            rterm, gterm, bterm = {}, {}, {}
            for u in range(8):
                row = 8 * pr + u
                cbrow = _fancy_chroma_row(
                    cb, row, sx, sy, band, mask_first, mask_last,
                    mask_lastlane,
                )
                crrow = _fancy_chroma_row(
                    cr, row, sx, sy, band, mask_first, mask_last,
                    mask_lastlane,
                )
                for oc in range(sx * 8):
                    cbi = cbrow[oc] - 128
                    cri = crrow[oc] - 128
                    k = (pr, u, oc)
                    rterm[k] = (FIX_1_40200 * cri + ONE_HALF) >> SCALEBITS
                    gterm[k] = (
                        -FIX_0_34414 * cbi + (-FIX_0_71414 * cri + ONE_HALF)
                    ) >> SCALEBITS
                    bterm[k] = (FIX_1_77200 * cbi + ONE_HALF) >> SCALEBITS
        per_u = [[None] * wpg for _ in range(8)]
        for pc in range(sx):
            ys = _idct_block_planes(
                lambda j: y_ref[0, pr, pc, j], lambda j: qty_ref[ni, j]
            )
            if "nocolor" in _ABLATE:
                for u in range(8):
                    for w in range(6):
                        per_u[u][pc * 6 + w] = ys[(u, w % 8)]
                continue
            for u in range(8):
                # Channel bytes of this pixel row, in raster order within
                # the sx*8-pixel span this parity group covers per lane.
                words = [None] * (2 * 3)  # 8 px * 3 ch / 4 B = 6 words
                for v in range(8):
                    if fancy:
                        cph = (pr, u, 8 * pc + v)
                    else:
                        cph = ((8 * pr + u) // sy, (8 * pc + v) // sx)
                    yv = ys[(u, v)]
                    r = jnp.clip(yv + rterm[cph], 0, 255)
                    g = jnp.clip(yv + gterm[cph], 0, 255)
                    b = jnp.clip(yv + bterm[cph], 0, 255)
                    for ch, val in enumerate((r, g, b)):
                        bidx = 3 * v + ch
                        w, byte = divmod(bidx, 4)
                        shifted = val << (8 * byte) if byte else val
                        words[w] = shifted if words[w] is None else words[w] | shifted
                for w in range(6):
                    per_u[u][pc * 6 + w] = words[w]
        for u in range(8):
            if interleave_store:
                # Raster-major store: the word-phase interleave happens
                # here with static lane shuffles, so no post-kernel
                # transpose exists at all.
                hbc = per_u[u][0].shape[-1]
                out_ref[0, :, pr, u] = _interleave_row(per_u[u], hbc)
            else:
                # One (band, wpg, hb) store per output row group (six
                # strided per-word stores measured no faster, but this is
                # fewer ops).
                out_ref[0, :, pr, u] = jnp.stack(per_u[u], axis=1)


def _band_halo(c, band: int, nbands: int):
    """(n, 64, vbc, hbc) -> (n, 64, nbands, band+2, hbc) overlapping band
    windows with a one-BLOCK-ROW coefficient halo.  The outermost halo
    blocks (above the first / below the last block row) are zero filler:
    the kernel's edge masks replace those reads with the true edge rows
    (clamping must happen on SAMPLES, so it cannot be baked in here).
    """
    n, _, vbc, hbc = c.shape
    zero = jnp.zeros((n, 64, 1, hbc), c.dtype)
    cpad = jnp.concatenate([zero, c, zero], axis=2)
    return jnp.stack(
        [cpad[:, :, i * band : i * band + band + 2] for i in range(nbands)],
        axis=2,
    )


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10))
def decode_rgb_fused_soa(
    y_soa: jax.Array,    # (..., sy, sx, 64, vbC, hbC) int32/int16
    cb_soa: jax.Array,   # (..., 64, vbC, hbC)
    cr_soa: jax.Array,   # (..., 64, vbC, hbC)
    qty: jax.Array,      # (64,) / (8,8), or per image (..., 64) int32
    qtc: jax.Array,      # (2, 64) / (2, 8, 8), or per image (..., 2, 64)
    sx: int,
    sy: int,
    band: int = 8,
    fancy: bool = False,
    chroma_true: "tuple[int, int] | None" = None,  # (cw, ch), fancy only
    interleave_store: "bool | None" = None,
) -> jax.Array:
    """SoA coefficients -> (..., vbC'*sy*8, hbC*sx*8, 3) uint8 RGB.

    vbC is padded up to a multiple of ``band`` (band itself must be a
    multiple of 8 -- Mosaic block-shape rule); the returned height covers
    the padded grid, so crop to the true image height afterwards.

    ``fancy=True`` runs the bit-exact libjpeg triangle-filter chroma
    upsampling inside the kernel (chroma arrives with a one-block-row
    band halo; horizontal neighbors are one-lane shifts).  Requires
    ``chroma_true``.  Wider than one horizontal tile (hbC > 256), the
    sx == 2 modes leave exactly 2 WRONG output columns per tile seam
    (locally-replicated filter edges) -- callers must repair them
    (fancy_seam_columns() names them; engine/pipeline.py recomputes
    them with the unfused filters on a narrow strip).  sx == 1 (4:4:0)
    has no horizontal filter and needs no repair.

    ``interleave_store`` (default on) emits each output pixel row in
    raster word order inside the kernel via static lane shuffles, so the
    result is a pure reshape away from (H, W, 3) -- no post-kernel
    transpose.  JPEG_TPU_PIXEL_STORE=xla restores the old word-phase
    layout + XLA transpose (perf archaeology only).
    """
    assert band % 8 == 0, band
    if interleave_store is None:
        interleave_store = os.environ.get("JPEG_TPU_PIXEL_STORE") != "xla"
    *lead, _sy, _sx, sixtyfour, vbc, hbc = y_soa.shape
    assert (_sy, _sx, sixtyfour) == (sy, sx, 64), y_soa.shape
    n = int(np.prod(lead)) if lead else 1
    # Keep int16 coefficients at their native width into the kernel (the
    # upcast happens per-tile after load); anything else goes to int32.
    def _coerce(a):
        return a if a.dtype == jnp.int16 else a.astype(jnp.int32)

    y = _coerce(y_soa.reshape(n, sy, sx, 64, vbc, hbc))
    cb = _coerce(cb_soa.reshape(n, 64, vbc, hbc))
    cr = _coerce(cr_soa.reshape(n, 64, vbc, hbc))
    pad = (-vbc) % band
    if pad:
        y = jnp.pad(y, ((0, 0),) * 4 + ((0, pad), (0, 0)))
        cb = jnp.pad(cb, ((0, 0),) * 2 + ((0, pad), (0, 0)))
        cr = jnp.pad(cr, ((0, 0),) * 2 + ((0, pad), (0, 0)))
        vbc += pad
    qty = jnp.broadcast_to(qty.reshape(-1, 64), (n, 64)).astype(jnp.int32)
    qtc = jnp.broadcast_to(qtc.reshape(-1, 2, 64), (n, 2, 64)).astype(jnp.int32)

    # The kernel is purely lane-local (nearest upsampling is phase
    # selection, packing is per-word; fancy's one-lane shifts stay inside
    # a tile), so wide images tile along the chroma-block axis too --
    # otherwise the ~330 live (band, hbC) tiles exceed the 16 MB VMEM
    # scoped limit past hbC ~ 256 (observed at 8K).  Fancy keeps MORE
    # tiles live (sample planes + per-phase color terms): a 256-lane
    # fancy tile measured 18.3M scoped vmem (OOM), so tiled fancy uses
    # 128-lane tiles (single-tile fancy is proven to hbC=240, the 4K
    # 4:2:2 bench shape).
    hbc_true = hbc
    hb_tile = hbc if hbc <= 256 else (FANCY_HB_TILE if fancy else 256)
    hpad = (-hbc) % hb_tile
    if hpad:
        y = jnp.pad(y, ((0, 0),) * 5 + ((0, hpad),))
        cb = jnp.pad(cb, ((0, 0),) * 3 + ((0, hpad),))
        cr = jnp.pad(cr, ((0, 0),) * 3 + ((0, hpad),))
        hbc += hpad

    wpg = 6 * sx
    nbands = vbc // band
    nhtiles = hbc // hb_tile
    if fancy:
        # Lane-shift neighbors cannot cross horizontal tile seams: with
        # h-tiling (hbC > 256) the 2 output columns at each seam compute
        # with locally-replicated edges and MUST be repaired by the
        # caller (engine/pipeline.py fixes them with the unfused filters
        # on a narrow strip -- fancy_seam_columns() names them).
        assert chroma_true is not None
        cw, ch = chroma_true
        # Clamp geometry for the kernel's in-kernel sample-edge masks
        # (band-pad blocks only ever feed cropped output rows).
        lb, ue = divmod(ch - 1, 8)
        ve = (cw - 1) % 8
        fancy_meta = (lb, ue, ve, vbc - pad - 1, hbc_true - 1)
        cb = _band_halo(cb, band, nbands)
        cr = _band_halo(cr, band, nbands)
        chroma_spec = pl.BlockSpec(
            (1, 64, 1, band + 2, hb_tile),
            lambda ni, bi, hi, *_: (ni, 0, bi, 0, hi),
            memory_space=pltpu.VMEM,
        )
    else:
        fancy_meta = None
        chroma_spec = pl.BlockSpec(
            (1, 64, band, hb_tile),
            lambda ni, bi, hi, *_: (ni, 0, bi, hi),
            memory_space=pltpu.VMEM,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, nbands, nhtiles),
        in_specs=[
            pl.BlockSpec(
                (1, sy, sx, 64, band, hb_tile),
                lambda ni, bi, hi, *_: (ni, 0, 0, 0, bi, hi),
                memory_space=pltpu.VMEM,
            ),
            chroma_spec,
            chroma_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, band, sy, 8, wpg * hb_tile),
            lambda ni, bi, hi, *_: (ni, bi, 0, 0, hi),
            memory_space=pltpu.VMEM,
        )
        if interleave_store
        else pl.BlockSpec(
            (1, band, sy, 8, wpg, hb_tile),
            lambda ni, bi, hi, *_: (ni, bi, 0, 0, 0, hi),
            memory_space=pltpu.VMEM,
        ),
    )
    out_shape = (
        (n, vbc, sy, 8, wpg * hbc)
        if interleave_store
        else (n, vbc, sy, 8, wpg, hbc)
    )
    packed = pl.pallas_call(
        functools.partial(_fused_rgb_kernel, sx, sy, interleave_store, fancy_meta),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
        interpret=jax.default_backend() == "cpu",
    )(qty, qtc, y, cb, cr)
    h = vbc * sy * 8
    w = hbc * sx * 8
    if interleave_store:
        # Rows left the kernel raster-major: pure reshape + u8 view.
        words = packed.reshape(n, h, w * 3 // 4)
    elif "notranspose" in _ABLATE:  # perf archaeology: wrong pixel order
        words = packed.reshape(n, h, w * 3 // 4)
    else:
        # Word-phase axis to minor position (the only relayout, on packed
        # words), then free reshapes + u8 view to (H, W, 3).
        words = packed.transpose(0, 1, 2, 3, 5, 4).reshape(n, h, w * 3 // 4)
    rgb = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(n, h, w, 3)
    return rgb.reshape(*lead, h, w, 3) if lead else rgb[0]


# Tiled-fancy h-tile width (see decode_rgb_fused_soa's vmem note).
FANCY_HB_TILE = 128


def fancy_seam_columns(hbc: int, sx: int, width: int) -> "list[int]":
    """Output pixel columns the fused fancy kernel computes WRONG when the
    chroma grid spans multiple h-tiles (sx == 2 only).

    At each seam t (chroma lane FANCY_HB_TILE*t), the horizontal triangle
    filter's cross-lane neighbor is replaced by a local edge replicate on
    both sides, corrupting the odd output phase of the seam's left
    neighbor sample and the even phase of its first sample: 2 output
    columns per seam.  Everything else is exact (the vertical pass never
    crosses lanes; the globally-last-lane mask handles the true right
    edge).
    """
    if sx != 2 or hbc <= 256:
        return []
    cols = []
    for t in range(1, -(-hbc // FANCY_HB_TILE)):
        seam_px = sx * 8 * FANCY_HB_TILE * t
        for c in (seam_px - 1, seam_px):
            if 0 <= c < width:
                cols.append(c)
    return cols


def blocks_to_soa_split(coefs: jax.Array, sx: int, sy: int) -> jax.Array:
    """(..., vb, hb, 8, 8) luma blocks -> (..., sy, sx, 64, vb/sy, hb/sx).

    Parity-split coefficient planes: plane [pr, pc, j] at tile (i, k) is
    coefficient j of block (sy*i+pr, sx*k+pc).
    """
    *lead, vb, hb, _, _ = coefs.shape
    assert vb % sy == 0 and hb % sx == 0, (vb, hb, sx, sy)
    x = coefs.reshape(*lead, vb // sy, sy, hb // sx, sx, 64)
    order = list(range(len(lead)))
    a = len(lead)
    # (..., vbC, sy, hbC, sx, 64) -> (..., sy, sx, 64, vbC, hbC)
    return jnp.transpose(x, order + [a + 1, a + 3, a + 4, a, a + 2])


if __name__ == "__main__":
    # Self-test vs the unfused exact pipeline (TPU; one probe per process).
    # Covers BOTH upsample modes; misaligned dims exercise the in-kernel
    # sample-edge clamps, and 130 rows force a multi-band halo seam.
    from jpeg_gpu_tpu.engine import pipeline
    from jpeg_gpu_tpu.host.entropy import decode_scan
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.testing import corpus

    CASES = [
        ("4:2:0", 2, 2, "nearest", (128, 256)),
        ("4:4:4", 1, 1, "nearest", (128, 256)),
        ("4:2:2", 2, 1, "nearest", (128, 256)),
        ("4:2:0", 2, 2, "fancy", (130, 250)),
        ("4:2:2", 2, 1, "fancy", (130, 250)),
        ("4:4:0", 1, 2, "fancy", (130, 250)),
    ]
    for mode, sx, sy, ups, (hh, ww) in CASES:
        img = corpus.synthetic_rgb(hh, ww, seed=3)
        enc = corpus.own_jpeg(img, subsampling=mode, quality=85)
        parsed = parse(enc.data)
        hdr = parsed.header
        res = decode_scan(parsed)
        spec = pipeline.PipelineSpec.from_header(hdr, exact=True, upsample=ups)
        coefs = tuple(jnp.asarray(c) for c in res.coefs)
        qts = tuple(
            jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
            for c in hdr.components
        )
        ref = np.asarray(pipeline.decode_rgb(spec, coefs, qts))

        y_soa = blocks_to_soa_split(coefs[0], sx, sy)
        from jpeg_gpu_tpu.ops.idct_islow_pallas import blocks_to_soa

        cb_soa = blocks_to_soa(coefs[1])
        cr_soa = blocks_to_soa(coefs[2])
        qtc = jnp.stack([qts[1].reshape(64), qts[2].reshape(64)])
        fancy = ups == "fancy" and (sx, sy) != (1, 1)
        rgb = decode_rgb_fused_soa(
            y_soa, cb_soa, cr_soa, qts[0], qtc, sx, sy,
            fancy=fancy,
            chroma_true=spec.comp_sizes[1] if fancy else None,
        )
        got = np.asarray(rgb)[: hdr.height, : hdr.width]
        np.testing.assert_array_equal(got, ref)
        print(f"{mode} {ups}: fused RGB kernel bit-exact vs pipeline OK")
