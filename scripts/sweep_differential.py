"""Randomized TPU-vs-host differential sweep on the real chip.

The CPU test suite exercises the Pallas kernels only in interpret mode
(CLAUDE.md); this sweep drives the COMPILED fused pixel + entropy kernels
across random geometries, qualities, subsampling modes, restart intervals
and encoders, asserting impl="tpu" == impl="host" everywhere and
== impl="pil" for the always-bit-exact modes (grayscale, 4:4:4).

Each distinct geometry compiles (~30-90 s first run); expect ~20-40 min
for the default 20 configs.  Run solo -- compiles contend for the single
CPU core.

Usage: python scripts/sweep_differential.py [n_configs] [seed]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)

    import jpeg_gpu_tpu as jt
    from jpeg_gpu_tpu.testing import corpus

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 2026
    rng = np.random.default_rng(seed)
    modes = ["4:4:4", "4:2:2", "4:2:0", "4:4:0", "4:1:1"]
    fails = 0
    for i in range(n):
        h = int(rng.integers(9, 230))
        w = int(rng.integers(9, 230))
        q = int(rng.integers(30, 97))
        gray = bool(rng.integers(0, 3) == 0)
        r = int(rng.integers(0, 4))
        if gray:
            mode = "gray"
            img = corpus.synthetic_gray(h, w, seed=i)
            data = corpus.pil_jpeg(img, quality=q, restart_marker_blocks=r)
        else:
            mode = modes[int(rng.integers(0, len(modes)))]
            img = corpus.synthetic_rgb(h, w, seed=i)
            if mode in ("4:4:0", "4:1:1"):  # PIL cannot encode these
                data = corpus.own_jpeg(
                    img, subsampling=mode, quality=q,
                    restart_interval=max(r, 1),
                ).data
            else:
                data = corpus.pil_jpeg(
                    img, quality=q, subsampling=mode, restart_marker_blocks=r
                )
        tag = f"[{i:02d}] {h}x{w} q{q} {mode} r{r}"
        try:
            tpu = jt.decode(data, impl="tpu")
            ok = np.array_equal(tpu, jt.decode(data, impl="host"))
            if ok and mode in ("gray", "4:4:4"):
                ok = np.array_equal(tpu, jt.decode(data, impl="pil"))
            fails += not ok
            print(f"{tag}: {'OK' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            fails += 1
            print(f"{tag}: ERROR {type(e).__name__}: {e}", flush=True)
    print(f"sweep done: {n - fails}/{n} OK", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
