"""Batched throughput decode: many JPEGs -> one device program per bucket.

The throughput mode of BASELINE.json (config #4: an image corpus sharded
across chips).  Images are entropy-decoded on the host (native C++,
restart-parallel), grouped into *geometry buckets* -- same dimensions and
sampling structure compile to the same XLA program (SURVEY.md section 7,
hard part 4: bucket to bound recompiles) -- and each bucket decodes as one
batched device call, optionally shard_map'd over a (data, space) mesh.

Quantization tables may differ per image inside a bucket: they travel as a
batched (N, 1, 1, 8, 8) tensor and broadcast into the dequant multiply.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from jpeg_gpu_tpu.engine.pipeline import PipelineSpec, decode_rgb
from jpeg_gpu_tpu.host.parser import ParsedJpeg, parse
from jpeg_gpu_tpu.utils.logging import get_logger

log = get_logger("engine")


def _bucket_key(spec: PipelineSpec) -> Tuple:
    return (spec.width, spec.height, spec.comp_sizes, spec.comp_decs)


@dataclasses.dataclass
class _Bucket:
    spec: PipelineSpec
    indices: List[int]
    coefs: List[List[np.ndarray]]
    qtables: List[List[np.ndarray]]


def _entropy_decode(parsed: ParsedJpeg):
    from jpeg_gpu_tpu.host import entropy, entropy_native

    if entropy_native.available():
        return entropy_native.decode_scan(parsed)
    return entropy.decode_scan(parsed)


def decode_batch(
    datas: Sequence[bytes],
    exact: bool = True,
    mesh=None,
    upsample: str = "nearest",
) -> List[np.ndarray]:
    """Decode a corpus of JPEGs to RGB, batching same-geometry images.

    With ``mesh`` (a (data, space) jax Mesh, parallel/mesh.py), each
    bucket's batch is shard_map'd across the mesh; otherwise it runs as a
    single-device batched call.  Returns RGB arrays in input order.
    """
    buckets: Dict[Tuple, _Bucket] = {}
    for i, data in enumerate(datas):
        parsed = parse(data)
        spec = PipelineSpec.from_header(parsed.header, exact=exact, upsample=upsample)
        result = _entropy_decode(parsed)
        hdr = parsed.header
        qts = [
            hdr.quant_for(c).values.astype(np.int32) for c in hdr.components
        ]
        b = buckets.setdefault(
            _bucket_key(spec), _Bucket(spec=spec, indices=[], coefs=[], qtables=[])
        )
        b.indices.append(i)
        b.coefs.append(result.coefs)
        b.qtables.append(qts)

    out: List[Optional[np.ndarray]] = [None] * len(datas)
    for bucket in buckets.values():
        rgb = _decode_bucket(bucket, mesh)
        for j, i in enumerate(bucket.indices):
            out[i] = rgb[j]
    return out  # type: ignore[return-value]


def _decode_bucket(bucket: _Bucket, mesh) -> np.ndarray:
    spec = bucket.spec
    n = len(bucket.indices)
    ncomps = spec.ncomps
    coefs = tuple(
        jnp.asarray(np.stack([c[ci] for c in bucket.coefs]))
        for ci in range(ncomps)
    )
    # (N, 1, 1, 8, 8): broadcasts against (N, vb, hb, 8, 8) in the dequant.
    qtables = tuple(
        jnp.asarray(
            np.stack([q[ci] for q in bucket.qtables])[:, None, None, :, :]
        )
        for ci in range(ncomps)
    )
    if mesh is None:
        rgb = decode_rgb(spec, coefs, qtables)
        return np.asarray(rgb)

    from jpeg_gpu_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS
    from jpeg_gpu_tpu.parallel.shard import decode_batch_sharded

    data_size = mesh.shape[DATA_AXIS]
    space = mesh.shape[SPACE_AXIS]
    for ci in range(ncomps):
        vb = coefs[ci].shape[1]
        if vb % space:
            raise ValueError(
                f"component {ci} block rows ({vb}) not divisible by the "
                f"space axis ({space}); use a smaller space axis"
            )
    pad = (-n) % data_size
    if pad:
        coefs = tuple(
            jnp.concatenate([c, jnp.repeat(c[-1:], pad, axis=0)]) for c in coefs
        )
        qtables = tuple(
            jnp.concatenate([q, jnp.repeat(q[-1:], pad, axis=0)]) for q in qtables
        )
    rgb, _ = decode_batch_sharded(spec, mesh, coefs, qtables)
    rgb = np.asarray(rgb)[:n, : spec.height, : spec.width]
    return rgb
