"""Engine glue: parsed JPEG -> on-device entropy decode -> coefficients.

Combines the host-side stream packing (host/segments.py), the Pallas
decoder (ops/entropy_device.py) and the XLA assembly post-pass into the
QUANT-stage contract the pixel pipeline consumes -- the full "pack upload"
path: the host ships entropy bits; the device does everything else.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jpeg_gpu_tpu.errors import JpegFormatError
from jpeg_gpu_tpu.host.parser import ParsedJpeg
from jpeg_gpu_tpu.host.segments import (
    DeviceScanPlan,
    build_plan,
    build_plan_auto,
)
from jpeg_gpu_tpu.ops import entropy_device


@dataclasses.dataclass
class DeviceEntropyResult:
    coefs: Tuple[jax.Array, ...]  # per comp (vb, hb, 8, 8) int16, on device
    err: jax.Array                # (B, 8, 128) int32 error flags


def entropy_decode_device(
    parsed: ParsedJpeg,
    interpret: Optional[bool] = None,
    check_errors: bool = True,
    unroll: Optional[bool] = None,
    soa: bool = False,
    on_error: str = "raise",
    interleave: Optional[int] = None,
    ac_chunk: Optional[int] = None,
) -> DeviceEntropyResult:
    """Decode the scan's restart segments on the TPU.

    ``soa=True`` assembles parity-split coefficient planes (the fused
    pixel kernel's layout) instead of (vb, hb, 8, 8) blocks.

    ``on_error`` makes restart segments the fault-isolation boundary the
    format designed them to be (SURVEY.md section 5): "raise" aborts on
    any flagged segment (the reference's behaviour, ctx->error); "zero"
    salvages the image -- corrupt segments decode to zero coefficients
    (flat gray blocks) while every other segment is unaffected.
    """
    if on_error not in ("raise", "zero"):
        raise ValueError(f"on_error must be 'raise' or 'zero', got {on_error!r}")
    header = parsed.header
    plan = build_plan_auto(parsed)
    comp_geometry = tuple(
        (header.components[i].hsamp, header.components[i].vsamp)
        for i in header.scan.comp_idx
    )
    kernel_out, err = entropy_device.decode_segments_device(
        jnp.asarray(plan.streams),
        *(jnp.asarray(x) for x in plan.kernel_tables),
        interpret=interpret,
        unroll=unroll,
        interleave=interleave,
        ac_chunk=ac_chunk,
    )
    if plan.dc_base is not None:
        # DRI-less pseudo segments: restore the DC predictor continuation
        # the index scan recorded (before salvage, so zeroed segments stay
        # flat gray).
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
        plan.n_segments,
        plan.mcus_per_segment,
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
        flags = np.asarray(err).reshape(-1)[: plan.n_segments]
        if flags.any():
            bad = int(np.flatnonzero(flags)[0])
            raise JpegFormatError(
                f"device entropy decode failed in restart segment {bad} "
                f"(flags={int(flags[bad])})"
            )
    return DeviceEntropyResult(coefs=coefs, err=err)


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


def decode_image_device_sharded(
    parsed: ParsedJpeg,
    mesh,
    exact: bool = True,
    upsample: str = "nearest",
    check_errors: bool = True,
) -> np.ndarray:
    """Distributed fully-on-device decode of one image.

    Restart-segment batches shard over the mesh's data axis, coefficients
    are all_gathered over ICI, and the pixel pipeline splits MCU rows over
    the space axis (parallel/shard.py:decode_image_device_sharded).
    Returns the cropped RGB array.
    """
    from jpeg_gpu_tpu.engine import pipeline
    from jpeg_gpu_tpu.parallel.mesh import DATA_AXIS
    from jpeg_gpu_tpu.parallel.shard import (
        decode_image_device_sharded as _sharded,
    )

    header = parsed.header
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
