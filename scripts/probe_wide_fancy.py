"""Measure the fused wide-fancy path (h-tiled + seam repair) vs unfused.

Round 3 lifted the fused fancy kernel's one-h-tile width cap (hbC <= 256)
with 128-lane tiles + post-kernel seam-column repair.  This probe times
the 8K 4:2:0 fancy coefficient->RGB stage both ways on the real chip
(slope-measured, chained with a DC data dependency) and cross-checks
bit-identity first.

Usage: python scripts/probe_wide_fancy.py [H W]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 4320
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 7680

    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from jpeg_gpu_tpu.engine import pipeline
    from jpeg_gpu_tpu.host import entropy_native
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.testing import corpus

    dat = corpus.pil_jpeg(
        corpus.synthetic_rgb(h, w, seed=2), quality=85, subsampling="4:2:0"
    )
    parsed = parse(dat)
    hdr = parsed.header
    spec = pipeline.PipelineSpec.from_header(hdr, exact=True, upsample="fancy")
    geom = pipeline.fused_rgb_geometry(spec)
    assert geom is not None, "fused fancy must cover wide frames now"
    qts = tuple(
        jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
        for c in hdr.components
    )
    soa = tuple(
        jnp.asarray(c) for c in entropy_native.decode_scan(parsed, soa=True).coefs
    )
    blocks = tuple(
        jnp.asarray(c) for c in entropy_native.decode_scan(parsed).coefs
    )

    fused = np.asarray(pipeline.decode_rgb_soa(spec, geom, soa, qts))
    ref = np.asarray(pipeline.decode_rgb(spec, blocks, qts))
    identical = bool(np.array_equal(fused, ref))
    print(f"[probe] fused == unfused: {identical}", file=sys.stderr, flush=True)
    assert identical

    def chain(fn, coefs):
        @jax.jit
        def run(iters, coefs, qts):
            def body(_, carry):
                c0 = coefs[0] + (carry % 3).astype(coefs[0].dtype)
                out = fn(spec, (c0,) + coefs[1:], qts)
                return (jnp.sum(out.astype(jnp.uint32)) % 997 + carry).astype(
                    jnp.uint32
                )
            return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))
        return run

    fused_fn = chain(
        lambda s, c, q: pipeline.decode_rgb_soa.__wrapped__(s, geom, c, q), soa
    )
    unfused_fn = chain(
        lambda s, c, q: pipeline.decode_rgb.__wrapped__(s, c, q), blocks
    )

    def slope(fn, coefs, k1=3, k2=12, reps=3):
        int(fn(jnp.int32(k1), coefs, qts))  # warm/compile
        best = {k1: float("inf"), k2: float("inf")}
        for _ in range(reps):
            for k in (k1, k2):
                t0 = time.perf_counter()
                int(fn(jnp.int32(k), coefs, qts))
                best[k] = min(best[k], time.perf_counter() - t0)
        return (best[k2] - best[k1]) / (k2 - k1)

    mpix = h * w / 1e6
    fused_s = slope(fused_fn, soa)
    unfused_s = slope(unfused_fn, blocks)
    print(
        json.dumps(
            {
                "config": [h, w, "4:2:0", "fancy"],
                "bit_identical": identical,
                "fused_ms_per_frame": round(fused_s * 1e3, 3),
                "fused_mpix_per_s": round(mpix / fused_s, 1),
                "unfused_ms_per_frame": round(unfused_s * 1e3, 3),
                "unfused_mpix_per_s": round(mpix / unfused_s, 1),
                "speedup": round(unfused_s / fused_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
