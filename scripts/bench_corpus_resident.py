"""Corpus device-resident sustained throughput, isolated in one process.

Run by bench.py (JPEG_TPU_BENCH_FULL=1) as a SUBPROCESS: on this
container, executing any large-working-set program (the 1080p batch-8
pipeline) or taking one ~12 MB device->host fetch permanently degrades
subsequent dispatch/transfer-heavy loops in the same process by ~2-4x
(measured 148.9 -> 52.2 Mpix/s on this loop; no recovery via gc or cache
clears -- an axon client pathology, see CLAUDE.md).  A fresh process is
the only clean measurement context.

Prints one JSON line: {"corpus_device_resident_mpix_per_s": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import numpy as np

    from jpeg_gpu_tpu.engine.batch import decode_batch_device_resident
    from jpeg_gpu_tpu.testing import corpus

    datas = [
        corpus.pil_jpeg(
            corpus.synthetic_rgb(256, 256, seed=100 + i),
            quality=85,
            subsampling="4:2:0",
            optimize=True,
            restart_marker_blocks=1,
        )
        for i in range(64)
    ]
    rgb, err = decode_batch_device_resident(datas, check_errors=False)
    jax.block_until_ready(rgb)
    assert not np.asarray(err).any()
    del rgb, err
    # The flags fetch above is small; re-warm one resident call so the
    # timed loop starts clean.
    n_reps = 8
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [
            decode_batch_device_resident(datas, check_errors=False)
            for _ in range(n_reps)
        ]
        jax.block_until_ready([o[0] for o in outs])
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "corpus_device_resident_mpix_per_s": round(
                    n_reps * 64 * 256 * 256 / 1e6 / best, 1
                )
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
