"""Sharded batched decode: shard_map over the (data, space) mesh.

Decode of a batch of same-geometry images, images sharded over the ``data``
axis and MCU block rows sharded over the ``space`` axis.  Because nearest
chroma upsampling never crosses an MCU row (each output row reads exactly
one chroma row, yuv.fs.glsl:20 semantics), the steady-state pixel pipeline
needs **zero** inter-chip traffic -- the sharding is communication-free by
construction, which is the design goal (SURVEY.md section 7 step 5: make
boundary exchange the *only* ICI traffic, then remove it).

The one collective in the step is a ``psum``-reduced decode checksum over
both axes: a cheap global integrity signature (sum of all output samples)
that validates cross-shard agreement and keeps a real ICI collective in the
compiled program.  (The DC-boundary/halo exchanges arrive with the device
entropy decoder and fancy-upsampling modes, where real cross-shard
dependencies exist.)
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from jpeg_gpu_tpu.engine.pipeline import PipelineSpec
from jpeg_gpu_tpu.ops import color as color_ops
from jpeg_gpu_tpu.ops import idct as idct_ops
from jpeg_gpu_tpu.ops import idct_islow
from jpeg_gpu_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS


def _local_decode_rgb(spec: PipelineSpec, coefs, qtables):
    """Decode this shard's (batch_shard, row_shard) slab to RGB samples.

    Works on MCU-aligned shards: every component's block rows split evenly
    because the space axis divides the MCU row count.  Crop happens after
    (un-sharding or per-shard slicing at the caller).
    """
    planes = []
    for ci in range(spec.ncomps):
        if spec.exact:
            pix = idct_islow.dequant_idct_islow_pixels(coefs[ci], qtables[ci])
        else:
            pix = idct_ops.dequant_idct_pixels(coefs[ci], qtables[ci])
        plane = idct_ops.blocks_to_plane(pix)
        xdec, ydec = spec.comp_decs[ci]
        planes.append(color_ops.upsample_nearest(plane, xdec, ydec))
    if spec.ncomps == 1:
        y = planes[0]
        return jnp.broadcast_to(y[..., None], y.shape + (3,))
    return color_ops.ycbcr_to_rgb_exact(*planes)


@functools.partial(jax.jit, static_argnums=(0, 1))
def decode_batch_sharded(
    spec: PipelineSpec,
    mesh: Mesh,
    coefs: Tuple[jax.Array, ...],
    qtables: Tuple[jax.Array, ...],
):
    """Decode (N, vb, hb, 8, 8) coefficient batches over the mesh.

    Returns (rgb, checksum): rgb is (N, Hpad, Wpad, 3) uint8 sharded
    (data, space) on its first two axes -- still MCU-padded; callers crop
    ``[..., :H, :W, :]``.  checksum is a replicated uint32 decode signature
    (psum over all shards).
    """
    coef_specs = tuple(P(DATA_AXIS, SPACE_AXIS) for _ in coefs)
    # Per-image quant tables (N, 1, 1, 8, 8) shard with the batch; shared
    # (8, 8) tables replicate.
    q_specs = tuple(
        P(DATA_AXIS) if q.ndim == 5 else P() for q in qtables
    )

    def step(coefs, qtables):
        rgb = _local_decode_rgb(spec, coefs, qtables)
        local_sum = jnp.sum(rgb.astype(jnp.uint32))
        checksum = jax.lax.psum(
            jax.lax.psum(local_sum, DATA_AXIS), SPACE_AXIS
        )
        return rgb, checksum

    return shard_map(
        step,
        mesh=mesh,
        in_specs=(coef_specs, q_specs),
        out_specs=(P(DATA_AXIS, SPACE_AXIS), P()),
    )(coefs, qtables)
