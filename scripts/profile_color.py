"""Pinpoint the upsample+color cost: transpose vs upsample vs interleave.

Slope-timed at the bench shape (1080p 4:2:0, batch 8).  Stages:
  yuv      = islow IDCT + blocks_to_plane + crop (pipeline.decode_yuv)
  color    = nearest upsample + exact YCbCr->RGB from precomputed planes
  planar   = same color math but emitting (3, H, W) planar (no interleave)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jpeg_gpu_tpu.engine import pipeline
    from jpeg_gpu_tpu.host.entropy import decode_scan
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.ops import color as color_ops
    from jpeg_gpu_tpu.testing import corpus

    height, width, batch = 1080, 1920, 8
    img = corpus.synthetic_rgb(height, width, seed=0)
    data = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")
    parsed = parse(data)
    result = decode_scan(parsed)
    hdr = parsed.header
    spec = pipeline.PipelineSpec.from_header(hdr, exact=True)
    coefs = tuple(
        jnp.asarray(np.broadcast_to(c, (batch,) + c.shape).copy())
        for c in result.coefs
    )
    qtables = tuple(
        jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
        for c in hdr.components
    )
    # Precomputed full (MCU-padded) planes for the color-only stages.
    planes = tuple(
        np.asarray(p)
        for p in pipeline._sample_planes(spec, coefs, qtables)
    )
    planes_j = tuple(jnp.asarray(p) for p in planes)

    def chain_c(body_fn, iters):
        @jax.jit
        def run(coefs, qtables):
            def body(_, carry):
                c0 = coefs[0] + (carry % 3).astype(jnp.int16)
                out = body_fn((c0,) + coefs[1:], qtables)
                return (jnp.sum(out.astype(jnp.uint32)) % 997 + carry).astype(jnp.uint32)
            return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))
        return run

    def chain_p(body_fn, iters):
        @jax.jit
        def run(planes):
            def body(_, carry):
                p0 = planes[0] ^ (carry % 2).astype(jnp.uint8)
                out = body_fn((p0,) + planes[1:])
                return (jnp.sum(out.astype(jnp.uint32)) % 997 + carry).astype(jnp.uint32)
            return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))
        return run

    def measure(make, args, body_fn, k1=10, k2=60, reps=5):
        f1, f2 = make(body_fn, k1), make(body_fn, k2)
        int(f1(*args)); int(f2(*args))
        b1 = b2 = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); int(f1(*args)); b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter(); int(f2(*args)); b2 = min(b2, time.perf_counter() - t0)
        return (b2 - b1) / (k2 - k1)

    h, w = spec.height, spec.width

    def yuv_stage(c, q):
        outs = pipeline.decode_yuv.__wrapped__(spec, c, q)
        acc = jnp.zeros((), jnp.uint32)
        for o in outs:
            acc = acc + jnp.sum(o.astype(jnp.uint32))
        return acc

    def color_stage(planes):
        up = []
        for ci, p in enumerate(planes):
            xdec, ydec = spec.comp_decs[ci]
            p = color_ops.upsample_nearest(p, xdec, ydec)
            up.append(p[..., :h, :w])
        return color_ops.ycbcr_to_rgb_exact(*up)

    def upsample_stage(planes):
        acc = jnp.zeros((), jnp.uint32)
        for ci, p in enumerate(planes):
            xdec, ydec = spec.comp_decs[ci]
            p = color_ops.upsample_nearest(p, xdec, ydec)[..., :h, :w]
            acc = acc + jnp.sum(p.astype(jnp.uint32))
        return acc

    def planar_color_stage(planes):
        up = []
        for ci, p in enumerate(planes):
            xdec, ydec = spec.comp_decs[ci]
            p = color_ops.upsample_nearest(p, xdec, ydec)
            up.append(p[..., :h, :w])
        y, cb, cr = up
        yi = y.astype(jnp.int32)
        cbi = cb.astype(jnp.int32) - 128
        cri = cr.astype(jnp.int32) - 128
        r = yi + ((color_ops.FIX_1_40200 * cri + color_ops.ONE_HALF) >> color_ops.SCALEBITS)
        b = yi + ((color_ops.FIX_1_77200 * cbi + color_ops.ONE_HALF) >> color_ops.SCALEBITS)
        g = yi + ((-color_ops.FIX_0_34414 * cbi + (-color_ops.FIX_0_71414 * cri + color_ops.ONE_HALF)) >> color_ops.SCALEBITS)
        out = jnp.stack([r, g, b], axis=-3)  # (..., 3, H, W) planar
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    t_yuv = measure(chain_c, (coefs, qtables), yuv_stage)
    t_color = measure(chain_p, (planes_j,), color_stage)
    t_up = measure(chain_p, (planes_j,), upsample_stage)
    t_planar = measure(chain_p, (planes_j,), planar_color_stage)

    print(json.dumps({
        "batch": batch,
        "yuv_stage_ms": round(t_yuv * 1e3, 3),
        "upsample_only_ms": round(t_up * 1e3, 3),
        "color_interleaved_ms": round(t_color * 1e3, 3),
        "color_planar_ms": round(t_planar * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
