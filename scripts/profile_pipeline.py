"""Split the coefs->RGB pipeline cost: dequant+IDCT vs upsample+color.

Slope-timed at the bench shape (1080p 4:2:0, batch 8, exact islow path).
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
    from jpeg_gpu_tpu.testing import corpus

    height, width, batch = 1080, 1920, 8
    img = corpus.synthetic_rgb(height, width, seed=0)
    data = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")
    parsed = parse(data)
    result = decode_scan(parsed)
    hdr = parsed.header
    spec = pipeline.PipelineSpec.from_header(hdr, exact=True)
    spec_fast = pipeline.PipelineSpec.from_header(hdr, exact=False)
    coefs = tuple(
        jnp.asarray(np.broadcast_to(c, (batch,) + c.shape).copy())
        for c in result.coefs
    )
    qtables = tuple(
        jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
        for c in hdr.components
    )

    def chain(body_fn, iters):
        @jax.jit
        def run(coefs, qtables):
            def body(_, carry):
                c0 = coefs[0] + (carry % 3).astype(jnp.int16)
                out = body_fn((c0,) + coefs[1:], qtables)
                return (jnp.sum(out.astype(jnp.uint32)) % 997 + carry).astype(
                    jnp.uint32
                )
            return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))
        return run

    def measure(body_fn, k1=10, k2=60, reps=5):
        f1, f2 = chain(body_fn, k1), chain(body_fn, k2)
        int(f1(coefs, qtables))
        int(f2(coefs, qtables))
        b1 = b2 = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(f1(coefs, qtables))
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(f2(coefs, qtables))
            b2 = min(b2, time.perf_counter() - t0)
        return (b2 - b1) / (k2 - k1)

    # Full exact pipeline (bench headline).
    def full_exact(c, q):
        return pipeline.decode_rgb.__wrapped__(spec, c, q)

    # Full fast (float MXU) pipeline.
    def full_fast(c, q):
        return pipeline.decode_rgb.__wrapped__(spec_fast, c, q)

    # IDCT stage only (exact): per-plane pixels, summed to u8-ish output.
    def idct_only(c, q):
        from jpeg_gpu_tpu.ops import idct_islow
        outs = [idct_islow.dequant_idct_islow_pixels(ci, qi) for ci, qi in zip(c, q)]
        acc = jnp.zeros((), jnp.uint32)
        for o in outs:
            acc = acc + jnp.sum(o.astype(jnp.uint32))
        return acc

    t_exact = measure(full_exact)
    t_fast = measure(full_fast)
    t_idct = measure(idct_only)

    mpix = width * height * batch / 1e6
    print(json.dumps({
        "batch": batch,
        "exact_ms": round(t_exact * 1e3, 3),
        "fast_ms": round(t_fast * 1e3, 3),
        "idct_islow_ms": round(t_idct * 1e3, 3),
        "upsample_color_ms_est": round((t_exact - t_idct) * 1e3, 3),
        "exact_mpix_s": round(mpix / t_exact, 1),
        "fast_mpix_s": round(mpix / t_fast, 1),
    }))


if __name__ == "__main__":
    main()
