"""Time the device entropy kernel under one ablation (one per process).

Usage: python scripts/ablate_entropy_kernel.py [tokens]
where tokens is a comma list for JPEG_TPU_ENTROPY_ABLATE (empty = full
kernel).  Run each variant in its own process: a crashed Pallas program can
wedge the device, and the env flag is read once at import.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 1:
    os.environ["JPEG_TPU_ENTROPY_ABLATE"] = sys.argv[1]

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jpeg_gpu_tpu.host import segments as seg_mod
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.ops import entropy_device as edev
    from jpeg_gpu_tpu.testing import corpus

    height, width = 1080, 1920
    img = corpus.synthetic_rgb(height, width, seed=0)
    data = corpus.pil_jpeg(
        img, quality=85, subsampling="4:2:0", restart_marker_blocks=2
    )
    parsed = parse(data)
    plan = seg_mod.build_plan(parsed)
    streams = jnp.asarray(plan.streams)
    plan_rest = tuple(jnp.asarray(x) for x in plan.kernel_tables)

    @jax.jit
    def run(iters, streams, *rest):
        def body(_, carry):
            s = streams ^ (carry % 2).astype(jnp.int32)
            out, err = edev.decode_segments_device(s, *rest)
            return (
                jnp.sum(out.astype(jnp.int32)) % 997
                + jnp.sum(err) % 13
                + carry
            ).astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    def measure(iters, reps=5):
        it = jnp.int32(iters)
        int(run(it, streams, *plan_rest))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(run(it, streams, *plan_rest))
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = 10, 110
    t = (measure(k2) - measure(k1)) / (k2 - k1)
    print(json.dumps({
        "ablate": os.environ.get("JPEG_TPU_ENTROPY_ABLATE", ""),
        "kernel_ms": round(t * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
