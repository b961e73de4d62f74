"""Stage breakdown of the corpus serving path (BASELINE config #4).

Round-5 task: corpus_e2e was 6.0 Mpix/s (20x under the per-chip share).
This script attributes the wall time of decode_batch_device over a
64-image 256x256 bucket: per-image parse, plan build, corpus stacking,
upload, device program, fetch -- so the fix targets the real bottleneck.

Usage: python scripts/profile_corpus.py [n_images]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from jpeg_gpu_tpu.engine.batch import decode_batch_device
    from jpeg_gpu_tpu.engine.pipeline import PipelineSpec
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.host.segments import build_corpus_plan, build_plan
    from jpeg_gpu_tpu.testing import corpus

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    datas = [
        corpus.pil_jpeg(
            corpus.synthetic_rgb(256, 256, seed=100 + i),
            quality=85,
            subsampling="4:2:0",
            optimize=True,
            restart_marker_blocks=1,
        )
        for i in range(n)
    ]
    mpix = n * 256 * 256 / 1e6

    # Whole-path wall (warm).
    outs = decode_batch_device(datas)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = decode_batch_device(datas)
        best = min(best, time.perf_counter() - t0)
    print(f"e2e: {best*1e3:8.1f} ms  ({mpix/best:6.1f} Mpix/s)")

    # Host stages, isolated.
    t0 = time.perf_counter()
    parsed = [parse(d) for d in datas]
    t_parse = time.perf_counter() - t0
    t0 = time.perf_counter()
    plans = [build_plan(p) for p in parsed]
    t_plan = time.perf_counter() - t0
    t0 = time.perf_counter()
    specs = [PipelineSpec.from_header(p.header, exact=True) for p in parsed]
    t_spec = time.perf_counter() - t0
    t0 = time.perf_counter()
    qt = [
        np.stack(
            [p.header.quant_for(c).values.astype(np.int32) for c in p.header.components]
        )
        for p in parsed
    ]
    t_qt = time.perf_counter() - t0
    t0 = time.perf_counter()
    cp = build_corpus_plan(plans)
    t_corpus = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev = [
        jnp.asarray(cp.streams),
        tuple(jnp.asarray(x) for x in cp.kernel_tables),
        jnp.asarray(np.stack(qt)),
    ]
    jax.block_until_ready(dev[0])
    t_up = time.perf_counter() - t0
    print(
        f"parse {t_parse*1e3:7.1f}  plan {t_plan*1e3:7.1f}  "
        f"spec {t_spec*1e3:7.1f}  qt {t_qt*1e3:7.1f}  "
        f"corpus_stack {t_corpus*1e3:7.1f}  upload {t_up*1e3:7.1f}  (ms)"
    )
    print(
        f"streams {cp.streams.shape} = {cp.streams.nbytes/1e6:.2f} MB, "
        f"nw {cp.streams.shape[1]}, n_seg {cp.n_segments}, "
        f"batches/img {cp.batches_per_image}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
