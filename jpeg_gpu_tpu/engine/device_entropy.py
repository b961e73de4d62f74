"""Engine glue: parsed JPEG -> on-device entropy decode -> coefficients.

Combines the host-side stream packing (host/segments.py), the Pallas
decoder (ops/entropy_device.py) and the XLA assembly post-pass into the
QUANT-stage contract the pixel pipeline consumes -- the full "pack upload"
path: the host ships entropy bits; the device does everything else.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jpeg_gpu_tpu.errors import JpegFormatError, JpegUnsupportedError
from jpeg_gpu_tpu.host.parser import ParsedJpeg
from jpeg_gpu_tpu.host.segments import (
    DeviceScanPlan,
    build_plan,
    build_plan_auto,
    build_spec_scan_input,
)
from jpeg_gpu_tpu.ops import entropy_device
from jpeg_gpu_tpu.utils.logging import get_logger

log = get_logger("engine")


@dataclasses.dataclass
class DeviceEntropyResult:
    coefs: Tuple[jax.Array, ...]  # per comp (vb, hb, 8, 8) int16, on device
    err: jax.Array                # (B, 8, 128) int32 error flags
    # DRI-less device-specsync runs only: (rounds, total_records,
    # overflowed) from the parallel index scan, for artifacts/diagnostics.
    specsync_stats: Optional[np.ndarray] = None


@functools.partial(
    jax.jit,
    static_argnames=(
        "used_slots", "bpm", "sb", "maxrec", "n_mcus", "nw", "spw", "nws",
        "t_last", "max_rounds", "interpret", "unroll", "interleave",
        "ac_chunk",
    ),
)
def _spec_decode_kernel_out(
    windows, nbits, dcslot_c, acslot_c,
    comp_map, dcslot_map, acslot_map, seg_meta, cbase, counts, symbols,
    *, used_slots, bpm, sb, maxrec, n_mcus, nw, spw, nws, t_last,
    max_rounds, interpret, unroll, interleave, ac_chunk,
):
    """One program: device index scan -> on-device stream realign ->
    restart decode -> derived DC bases.  Returns (kernel_out, err, ok,
    stats); outputs are garbage unless ok (the caller falls back)."""
    from jpeg_gpu_tpu.ops import specsync_device

    bitpos, ok, stats = specsync_device.device_index_scan(
        windows, nbits, dcslot_c, acslot_c, cbase, counts, symbols,
        used_slots=used_slots, bpm=bpm, sb=sb, maxrec=maxrec,
        n_mcus=n_mcus, max_rounds=max_rounds, interpret=interpret,
    )
    # Row-width check: every pseudo segment (plus its worst-case one-word
    # refill overshoot) must fit the nw-word rows the gather builds, or
    # the decode would read zeros mid-segment.  Folded into ok -> the
    # caller falls back and (in serving) re-pins a larger nw.
    seg_bits = jnp.diff(bitpos, append=nbits.astype(jnp.int32))
    ok = jnp.logical_and(ok, jnp.max(seg_bits) + 63 <= nw * 32)
    streams = specsync_device.gather_entropy_streams(
        windows, bitpos, nw=nw, spw=spw, nws=nws
    )
    out, err = entropy_device.decode_segments_device(
        streams, comp_map, dcslot_map, acslot_map, seg_meta,
        cbase, counts, symbols,
        interpret=interpret, unroll=unroll, interleave=interleave,
        ac_chunk=ac_chunk,
    )
    dcb = specsync_device.dc_base_from_coefs(out, t_last)
    out = entropy_device.apply_dc_base(out, dcb, comp_map)
    return out, err, ok, stats


def _specsync_enabled() -> bool:
    return os.environ.get("JPEG_TPU_SPECSYNC", "1") != "0"


def _spec_decode_try(
    parsed: ParsedJpeg, interpret, unroll, interleave, ac_chunk,
):
    """DRI-less decode via the device parallel index scan.

    Returns (kernel_out, err, stats) with the DC bases already applied,
    or None when the scan did not converge / overflowed its record rows
    / the stream is out of range -- the caller then falls back to the
    serial host scan (build_plan_auto), the prototype's contract."""
    try:
        inp = build_spec_scan_input(parsed)
    except JpegUnsupportedError:
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out, err, ok, stats = _spec_decode_kernel_out(
        jnp.asarray(inp.windows),
        jnp.asarray(np.array([inp.n_bits], np.int32)),
        jnp.asarray(inp.dcslot_of_c),
        jnp.asarray(inp.acslot_of_c),
        jnp.asarray(inp.comp_of_step),
        jnp.asarray(inp.dc_slot_of_step),
        jnp.asarray(inp.ac_slot_of_step),
        jnp.asarray(inp.seg_meta),
        jnp.asarray(inp.cbase),
        jnp.asarray(inp.counts),
        jnp.asarray(inp.symbols),
        used_slots=inp.used_slots, bpm=inp.bpm, sb=inp.subseq_bytes,
        maxrec=inp.maxrec, n_mcus=inp.n_mcus, nw=inp.nw, spw=inp.spw,
        nws=inp.nws, t_last=inp.t_last, max_rounds=16,
        interpret=bool(interpret), unroll=unroll, interleave=interleave,
        ac_chunk=ac_chunk,
    )
    if not bool(ok):
        log.debug(
            "device specsync did not converge (stats=%s); falling back "
            "to the serial index scan", np.asarray(stats),
        )
        return None
    return out, err, np.asarray(stats)


def entropy_decode_device(
    parsed: ParsedJpeg,
    interpret: Optional[bool] = None,
    check_errors: bool = True,
    unroll: Optional[bool] = None,
    soa: bool = False,
    on_error: str = "raise",
    interleave: Optional[int] = None,
    ac_chunk: Optional[int] = None,
    specsync: Optional[bool] = None,
) -> DeviceEntropyResult:
    """Decode the scan's restart segments on the TPU.

    ``soa=True`` assembles parity-split coefficient planes (the fused
    pixel kernel's layout) instead of (vb, hb, 8, 8) blocks.

    ``on_error`` makes restart segments the fault-isolation boundary the
    format designed them to be (SURVEY.md section 5): "raise" aborts on
    any flagged segment (the reference's behaviour, ctx->error); "zero"
    salvages the image -- corrupt segments decode to zero coefficients
    (flat gray blocks) while every other segment is unaffected.

    DRI-less streams default to the DEVICE parallel index scan
    (ops/specsync_device.py): the host only destuffs and uploads window
    rows, and pseudo-segment boundaries, stream realignment and DC bases
    are all computed on the TPU.  Non-convergence/overflow falls back to
    the serial host scan transparently.  ``specsync=False`` (or env
    JPEG_TPU_SPECSYNC=0) forces the host-scan path.
    """
    if on_error not in ("raise", "zero"):
        raise ValueError(f"on_error must be 'raise' or 'zero', got {on_error!r}")
    header = parsed.header
    comp_geometry = tuple(
        (header.components[i].hsamp, header.components[i].vsamp)
        for i in header.scan.comp_idx
    )
    if specsync is None:
        specsync = _specsync_enabled()
    spec_stats = None
    spec_result = None
    if (
        specsync
        and not header.restart_interval
        and len(parsed.segments) == 1
        and header.n_mcus >= 2
    ):
        spec_result = _spec_decode_try(
            parsed, interpret, unroll, interleave, ac_chunk
        )
    if spec_result is not None:
        kernel_out, err, spec_stats = spec_result
        plan_nseg, plan_mps = header.n_mcus, 1
    else:
        plan = build_plan_auto(parsed)
        plan_nseg, plan_mps = plan.n_segments, plan.mcus_per_segment
        kernel_out, err = entropy_device.decode_segments_device(
            jnp.asarray(plan.streams),
            *(jnp.asarray(x) for x in plan.kernel_tables),
            interpret=interpret,
            unroll=unroll,
            interleave=interleave,
            ac_chunk=ac_chunk,
        )
        if plan.dc_base is not None:
            # DRI-less pseudo segments: restore the DC predictor
            # continuation the index scan recorded (before salvage, so
            # zeroed segments stay flat gray).
            nbatch = kernel_out.shape[0]
            dcb = np.zeros(
                (nbatch * 8 * 128, plan.dc_base.shape[1]), dtype=np.int32
            )
            dcb[: plan.n_segments] = plan.dc_base
            kernel_out = entropy_device.apply_dc_base(
                kernel_out,
                jnp.asarray(dcb.reshape(nbatch, 8, 128, -1)),
                jnp.asarray(plan.comp_of_step),
            )
    if on_error == "zero":
        # Blank flagged segments: the damage stays inside the restart
        # boundary instead of failing the whole image.
        kernel_out = jnp.where(
            (err != 0)[:, None, None], jnp.int16(0), kernel_out
        )
    coefs = _assemble(
        kernel_out,
        plan_nseg,
        plan_mps,
        header.n_mcus,
        header.nhmb,
        header.nvmb,
        comp_geometry,
        soa,
        header.scan.comp_idx,
    )
    if check_errors and on_error == "raise":
        # Flags are exact for every segment (the kernel suppresses the
        # spurious tail flags of a short last segment itself).
        flags = np.asarray(err).reshape(-1)[:plan_nseg]
        if flags.any():
            bad = int(np.flatnonzero(flags)[0])
            raise JpegFormatError(
                f"device entropy decode failed in restart segment {bad} "
                f"(flags={int(flags[bad])})"
            )
    return DeviceEntropyResult(coefs=coefs, err=err, specsync_stats=spec_stats)


@functools.partial(jax.jit, static_argnums=range(1, 9))
def _assemble(
    kernel_out, n_segments, mcus_per_segment, n_mcus, nhmb, nvmb, geom,
    soa=False, frame_order=None,
):
    # Module-level jit so identical geometries hit the trace cache (a
    # per-call functools.partial wrapper retraced every decode).
    return entropy_device.assemble_components(
        kernel_out,
        n_segments=n_segments,
        mcus_per_segment=mcus_per_segment,
        n_mcus=n_mcus,
        nhmb=nhmb,
        nvmb=nvmb,
        comp_geometry=geom,
        soa=soa,
        frame_order=frame_order,
    )


def expand_pack_device(
    parsed: ParsedJpeg,
    scan,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, ...]:
    """PACK-upload path: ship (run,value) streams, expand to coefs on device.

    ``scan`` is a host ScanResult with ``want_pack=True``.  Covers streams
    without restart markers (the host did the Huffman work); minimises
    host->device bytes like the reference's pack mode (jpeg_gpu.c:1287).
    """
    from jpeg_gpu_tpu.host.pack_plan import build_pack_plan
    from jpeg_gpu_tpu.ops import pack_device

    header = parsed.header
    plan = build_pack_plan(parsed, scan)
    kernel_out = pack_device.expand_pack_device(
        jnp.asarray(plan.streams), plan.blocks_per_segment, interpret=interpret
    )
    comp_geometry = tuple(
        (header.components[i].hsamp, header.components[i].vsamp)
        for i in header.scan.comp_idx
    )
    return _assemble(
        kernel_out,
        plan.n_segments,
        plan.mcus_per_segment,
        header.n_mcus,
        header.nhmb,
        header.nvmb,
        comp_geometry,
        False,
        header.scan.comp_idx,
    )


def _spec_decode_sharded_try(
    parsed: ParsedJpeg, mesh, exact, upsample, check_errors
) -> Optional[np.ndarray]:
    """Distributed DRI-less decode via the replicated device index scan.

    Returns the cropped RGB array, or None when the scan did not
    converge / the stream is out of range (the caller then runs the
    serial host-scan path)."""
    from jpeg_gpu_tpu.engine import pipeline
    from jpeg_gpu_tpu.parallel.shard import decode_image_device_sharded_spec

    header = parsed.header
    try:
        inp = build_spec_scan_input(parsed)
    except JpegUnsupportedError:
        return None
    spec = pipeline.PipelineSpec.from_header(
        header, exact=exact, upsample=upsample
    )
    geom = tuple(
        (header.components[i].hsamp, header.components[i].vsamp)
        for i in header.scan.comp_idx
    )
    assemble_args = (
        header.n_mcus, 1, header.n_mcus, header.nhmb, header.nvmb, geom,
        header.scan.comp_idx,
    )
    scan_cfg = (
        inp.used_slots, inp.bpm, inp.subseq_bytes, inp.maxrec, inp.nw,
        inp.spw, inp.nws, inp.t_last,
    )
    qtables = tuple(
        jnp.asarray(header.quant_for(c).values.astype(np.int32))
        for c in header.components
    )
    rgb, err, ok = decode_image_device_sharded_spec(
        spec, mesh, assemble_args, scan_cfg,
        jnp.asarray(inp.windows),
        jnp.asarray(np.array([inp.n_bits], np.int32)),
        (jnp.asarray(inp.dcslot_of_c), jnp.asarray(inp.acslot_of_c)),
        tuple(
            jnp.asarray(x)
            for x in (
                inp.comp_of_step, inp.dc_slot_of_step, inp.ac_slot_of_step,
                inp.seg_meta, inp.cbase, inp.counts, inp.symbols,
            )
        ),
        qtables,
    )
    if not bool(ok):
        log.debug("sharded device specsync did not converge; falling back")
        return None
    if check_errors:
        flags = np.asarray(err).reshape(-1)[: header.n_mcus]
        if flags.any():
            bad = int(np.flatnonzero(flags)[0])
            raise JpegFormatError(
                f"device entropy decode failed in pseudo segment {bad}"
            )
    return np.asarray(rgb)[: header.height, : header.width]


def decode_image_device_sharded(
    parsed: ParsedJpeg,
    mesh,
    exact: bool = True,
    upsample: str = "nearest",
    check_errors: bool = True,
    specsync: Optional[bool] = None,
) -> np.ndarray:
    """Distributed fully-on-device decode of one image.

    Restart-segment batches shard over the mesh's data axis, coefficients
    are all_gathered over ICI, and the pixel pipeline splits MCU rows over
    the space axis (parallel/shard.py:decode_image_device_sharded).
    Returns the cropped RGB array.

    DRI-less streams default to the DEVICE parallel index scan run
    replicated per chip (parallel/shard.py:
    decode_image_device_sharded_spec) -- no serial host scan in the
    distributed path either; non-convergence falls back to it.
    """
    from jpeg_gpu_tpu.engine import pipeline
    from jpeg_gpu_tpu.parallel.mesh import DATA_AXIS
    from jpeg_gpu_tpu.parallel.shard import (
        decode_image_device_sharded as _sharded,
    )

    header = parsed.header
    if specsync is None:
        specsync = _specsync_enabled()
    if (
        specsync
        and not header.restart_interval
        and len(parsed.segments) == 1
        and header.n_mcus >= 2
    ):
        rgb = _spec_decode_sharded_try(
            parsed, mesh, exact, upsample, check_errors
        )
        if rgb is not None:
            return rgb
    plan = build_plan_auto(parsed)
    data_size = mesh.shape[DATA_AXIS]
    streams = plan.streams
    pad = (-streams.shape[0]) % data_size
    if pad:  # dummy batches decode 1-padding garbage; flagged + ignored
        filler = np.full(
            (pad,) + streams.shape[1:], -1, dtype=streams.dtype
        )
        streams = np.concatenate([streams, filler])
    if plan.dc_base is not None:
        # DRI-less pseudo segments: per-batch DC bases ride the same data
        # sharding as the streams.
        dcb = np.zeros(
            (streams.shape[0] * 8 * 128, plan.dc_base.shape[1]), np.int32
        )
        dcb[: plan.n_segments] = plan.dc_base
        dcb = jnp.asarray(dcb.reshape(streams.shape[0], 8, 128, -1))
    else:
        dcb = None
    plan_tables = tuple(jnp.asarray(x) for x in plan.kernel_tables)
    geom = tuple(
        (header.components[i].hsamp, header.components[i].vsamp)
        for i in header.scan.comp_idx
    )
    spec = pipeline.PipelineSpec.from_header(header, exact=exact, upsample=upsample)
    assemble_args = (
        plan.n_segments, plan.mcus_per_segment, header.n_mcus,
        header.nhmb, header.nvmb, geom, header.scan.comp_idx,
    )
    qtables = tuple(
        jnp.asarray(header.quant_for(c).values.astype(np.int32))
        for c in header.components
    )
    rgb, err = _sharded(
        spec, mesh, assemble_args, jnp.asarray(streams), plan_tables,
        qtables, dcb,
    )
    if check_errors:
        flags = np.asarray(err).reshape(-1)[: plan.n_segments]
        if flags.any():
            bad = int(np.flatnonzero(flags)[0])
            raise JpegFormatError(
                f"device entropy decode failed in restart segment {bad}"
            )
    return np.asarray(rgb)[: header.height, : header.width]


def decode_image_device(
    parsed: ParsedJpeg,
    stage="rgb",
    exact: bool = True,
    upsample: str = "nearest",
    interpret: Optional[bool] = None,
    on_error: str = "raise",
):
    """Fully on-device decode: entropy bits in HBM -> pixels in HBM.

    The complete north-star path (BASELINE.json): the host only parses
    markers and packs destuffed segment words; Huffman decode, dequant,
    IDCT, upsample and color conversion all run on the TPU with no
    intermediate host round-trip.
    """
    from jpeg_gpu_tpu.engine import pipeline
    from jpeg_gpu_tpu.engine.stages import OutputStage

    header = parsed.header
    spec = pipeline.PipelineSpec.from_header(header, exact=exact, upsample=upsample)
    stage = stage if isinstance(stage, OutputStage) else OutputStage(stage)
    geom = pipeline.fused_rgb_geometry(spec)
    use_fused = stage == OutputStage.RGB and geom is not None
    result = entropy_decode_device(
        parsed, interpret=interpret, soa=use_fused, on_error=on_error
    )
    qtables = tuple(
        header.quant_for(c).values.astype(np.int32) for c in header.components
    )
    if stage == OutputStage.QUANT:
        return result.coefs
    if use_fused:
        qts = tuple(jnp.asarray(q) for q in qtables)
        return pipeline.decode_rgb_soa(spec, geom, result.coefs, qts)
    return pipeline.run(spec, stage, result.coefs, qtables)
