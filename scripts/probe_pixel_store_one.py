"""One-variant fused-pixel-store timing (fresh process per variant).

Times the bench headline program (decode_rgb_soa through the fused
Pallas pixel kernel, 1080p 4:2:0 batch 8, exact islow) with whichever
store JPEG_TPU_PIXEL_STORE selects: unset = raster-major in-kernel
store (round-2 default), "xla" = round-1 word-phase layout + XLA
minor-axis transpose.  The fused op's jit trace reads the env once per
process (pixel_fused.py fused_rgb interleave_store default), so the two
variants MUST run in separate processes, sequentially (one CPU core --
never two compiling processes at once).

Run:
    python scripts/probe_pixel_store_one.py
    JPEG_TPU_PIXEL_STORE=xla python scripts/probe_pixel_store_one.py
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

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp

    from jpeg_gpu_tpu.engine import pipeline
    from jpeg_gpu_tpu.host import entropy_native
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.testing import corpus

    height, width, batch = 1080, 1920, 8
    img = corpus.synthetic_rgb(height, width, seed=0)
    data = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")
    parsed = parse(data)
    hdr = parsed.header
    spec = pipeline.PipelineSpec.from_header(hdr, exact=True)
    geom = pipeline.fused_rgb_geometry(spec)
    assert geom is not None and entropy_native.available()
    host_coefs = entropy_native.decode_scan(parsed, soa=True).coefs
    coefs = tuple(
        jnp.asarray(np.broadcast_to(c, (batch,) + c.shape).copy())
        for c in host_coefs
    )
    qtables = tuple(
        jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
        for c in hdr.components
    )

    # Same chain as bench.py's headline: traced iteration count (one
    # compile serves both slope points), DC perturbation dependency,
    # full-output checksum consumer.
    @jax.jit
    def chained(iters, coefs, qtables):
        def body(_, carry):
            c0 = coefs[0] + (carry % 3).astype(jnp.int16)
            out = pipeline.decode_rgb_soa.__wrapped__(
                spec, geom, (c0,) + coefs[1:], qtables
            )
            return (jnp.sum(out.astype(jnp.uint32)) % 997 + carry).astype(
                jnp.uint32
            )

        return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))

    def best_time(iters, reps=5):
        it = jnp.int32(iters)
        t0 = time.perf_counter()
        int(chained(it, coefs, qtables))  # warm / compile
        print(f"[probe] warm k={iters}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chained(it, coefs, qtables))
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = 20, 120
    t = (best_time(k2) - best_time(k1)) / (k2 - k1)
    mpix = width * height * batch / 1e6
    print(
        json.dumps(
            {
                "store": os.environ.get("JPEG_TPU_PIXEL_STORE", "raster"),
                "ms_per_batch": round(t * 1e3, 3),
                "mpix_s": round(mpix / t, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
