"""Randomized TPU-vs-host differential sweep on the real chip -> SWEEP_r*.json.

The CPU test suite exercises the Pallas kernels only in interpret mode
(CLAUDE.md); this sweep drives the COMPILED fused pixel + entropy kernels
across random geometries, qualities, subsampling modes, restart intervals
and encoders, asserting:

* impl="tpu" == impl="host" for every config (nearest + fancy),
* == impl="pil" for the always-bit-exact modes (grayscale, 4:4:4) and for
  every subsampled config decoded with upsample="fancy" (the libjpeg
  default pipeline parity contract),
* entropy="device" (the compiled entropy kernel, incl. chunked early-exit
  when enabled) == host entropy on restart-interval streams.

Writes a JSON artifact (configs, pass/fail, output checksums) so each
round records proof that the bytes serving on the TPU match the host
reference -- the role of the reference's designed-in differential duality
(jpeg_gpu.c:546-557), automated.

Each distinct geometry compiles (~30-90 s first run; cached after), so the
default 14 random + 4 pinned configs keep the run bounded (~20 min warm
cache; the three store cross-checks each cost one extra compile).  Run
solo -- compiles contend for the single CPU core.

Usage: python scripts/sweep_differential.py [n_configs] [seed] [out.json]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _checksum(arr) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()[:16]


def main() -> int:
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jpeg_gpu_tpu as jt
    from jpeg_gpu_tpu.testing import corpus

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 2026
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        repo, "SWEEP_r05.json"
    )
    rng = np.random.default_rng(seed)
    modes = ["4:4:4", "4:2:2", "4:2:0", "4:4:0", "4:1:1"]
    # Pinned configs the random draw cannot reach: wide frames whose
    # chroma-block count straddles a 128-lane gather chunk in the fused
    # kernel's raster-major store (hbC > 128), a 4K-class width whose
    # store spans THREE gather chunks (hbC > 256), and a vsamp=4 geometry
    # through the compiled general (unfused) path.
    # (h, w, q, mode, restart, ups, store_xcheck) -- store_xcheck marks
    # fused-path configs where the raster-major in-kernel store is
    # cross-checked against the post-kernel XLA-transpose store.
    pinned = [
        (48, 2100, 85, "4:2:0", 1, "fancy", True),    # hbC=132 straddle, fancy
        (40, 1200, 75, "4:4:4", 0, "nearest", True),  # hbC=150 + DRI-less dev
        (48, 4200, 85, "4:2:0", 1, "nearest", True),  # hbC=263: three chunks
        (64, 40, 85, "h2v4", 1, "nearest", False),    # vsamp=4 general path
        (48, 4200, 85, "4:2:0", 1, "fancy", True),    # hbC=263 fancy: 2 h-tiles
        #                               + the post-kernel seam repair, vs PIL
        (40, 72, 85, "4:1:1", 1, "fancy", False),     # 4:1:1 fancy vs libjpeg
        #                     (h4v1 -> replication on both sides), compiled
    ]
    records = []
    fails = 0
    t_start = time.time()
    for i in range(n + len(pinned)):
        if i >= n:
            h, w, q, mode_pin, r, ups_pin, store_xcheck = pinned[i - n]
            gray = False
            fancy = ups_pin == "fancy"
        else:
            store_xcheck = False
            h = int(rng.integers(9, 230))
            w = int(rng.integers(9, 230))
            q = int(rng.integers(30, 97))
            gray = bool(rng.integers(0, 3) == 0)
            r = int(rng.integers(0, 4))
            fancy = bool(rng.integers(0, 2))
        if gray:
            mode = "gray"
            img = corpus.synthetic_gray(h, w, seed=i)
            data = corpus.pil_jpeg(img, quality=q, restart_marker_blocks=r)
        else:
            mode = (
                mode_pin if i >= n
                else modes[int(rng.integers(0, len(modes)))]
            )
            img = corpus.synthetic_rgb(h, w, seed=i)
            if mode not in ("4:4:4", "4:2:2", "4:2:0"):  # PIL cannot encode
                data = corpus.own_jpeg(
                    img, subsampling=mode, quality=q,
                    restart_interval=max(r, 1),
                ).data
            else:
                data = corpus.pil_jpeg(
                    img, quality=q, subsampling=mode, restart_marker_blocks=r
                )
        ups = "fancy" if fancy else "nearest"
        cfg = {
            "i": i, "h": h, "w": w, "q": q, "mode": mode, "restart": r,
            "upsample": ups,
        }
        tag = f"[{i:02d}] {h}x{w} q{q} {mode} r{r} {ups}"
        checks = {}
        try:
            tpu = jt.decode(data, impl="tpu", upsample=ups)
            host = jt.decode(data, impl="host", upsample=ups)
            checks["tpu_eq_host"] = bool(np.array_equal(tpu, host))
            # libjpeg parity: always for gray/4:4:4; for subsampled modes
            # the fancy path is the bit-exact contract.  4:1:1 included:
            # libjpeg's jdmaster only has fancy kernels for h2v1/h2v2 and
            # falls back to int_upsample (replication) for h4v1, which is
            # exactly what our fancy path does there too.
            if mode in ("gray", "4:4:4") or fancy:
                checks["tpu_eq_libjpeg"] = bool(
                    np.array_equal(tpu, jt.decode(data, impl="pil"))
                )
            # r=0 streams exercise the DRI-less index-scan pseudo-segment
            # path; r>0 the real restart-segment path.
            dev = jt.decode(
                data, impl="tpu", entropy="device", upsample=ups
            )
            checks["device_entropy_eq"] = bool(np.array_equal(dev, tpu))
            if store_xcheck:  # every fused-path pinned config:
                # the fused kernel's raster-major in-kernel store (the
                # default) against the post-kernel XLA transpose store --
                # two independent compiled lowerings of the same pixels,
                # covering the one-, two- and three-gather-chunk widths
                # and the fancy in-kernel filters.  The store choice
                # resolves inside the jitted trace, so the cache must be
                # cleared around the env flip (costs one extra compile
                # of each cross-checked geometry).
                from jpeg_gpu_tpu.engine import pipeline as _pl

                os.environ["JPEG_TPU_PIXEL_STORE"] = "xla"
                _pl.decode_rgb_soa.clear_cache()
                try:
                    alt = jt.decode(data, impl="tpu", upsample=ups)
                finally:
                    del os.environ["JPEG_TPU_PIXEL_STORE"]
                    _pl.decode_rgb_soa.clear_cache()
                checks["raster_eq_xla_store"] = bool(
                    np.array_equal(alt, tpu)
                )
            ok = all(checks.values())
            checks["rgb_sha"] = _checksum(tpu)
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            ok = False
            checks["error"] = f"{type(e).__name__}: {e}"
        fails += not ok
        records.append({**cfg, **checks, "ok": ok})
        print(f"{tag}: {'OK' if ok else 'FAIL ' + str(checks)}", flush=True)

    total = n + len(pinned)
    artifact = {
        "n": total,
        "n_random": n,
        "n_pinned": len(pinned),
        "seed": seed,
        "passed": total - fails,
        "failed": fails,
        "wall_s": round(time.time() - t_start, 1),
        "backend": jax.default_backend(),
        "entropy_chunk_env": os.environ.get("JPEG_TPU_ENTROPY_CHUNK"),
        "configs": records,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"sweep done: {total - fails}/{total} OK -> {out_path}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
