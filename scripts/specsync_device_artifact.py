"""Round artifact: the DEVICE parallel index scan vs the serial native scan.

Writes SPECSYNC_DEVICE_r*.json recording, on the real chip:

* bit-identity of the compiled device scan's per-MCU bit offsets against
  the native serial index scan across a config corpus (sizes, qualities,
  subsampling modes, both encoders),
* full-decode equality of the engine's specsync path (device-derived DC
  bases included) against the host pipeline,
* the fallback contract: a forced record-overflow run must transparently
  decode via the serial scan,
* 1080p serving numbers: device scan ms/frame (slope-measured), host
  window-build ms, the serial native scan ms it replaces, and the
  overlapped e2e bytes->pixels throughput of the specsync serving loop
  (the BENCH_r05 e2e_no_dri number's standalone reproduction).

Run SOLO (compiles contend for the single CPU core); one process is fine
-- the scan kernel has no known wedge modes, and each distinct geometry
compiles once (~20-90 s).

Usage: python scripts/specsync_device_artifact.py [out.json]
"""

from __future__ import annotations

import functools
import json
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

    import jpeg_gpu_tpu as jt
    from jpeg_gpu_tpu.engine import device_entropy
    from jpeg_gpu_tpu.host import entropy_native as en
    from jpeg_gpu_tpu.host import segments as seg_mod
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.ops import specsync_device as sd
    from jpeg_gpu_tpu.testing import corpus

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "SPECSYNC_DEVICE_r05.json"
    )

    def scan_args(inp):
        return (
            jnp.asarray(inp.windows),
            jnp.asarray(np.array([inp.n_bits], np.int32)),
            jnp.asarray(inp.dcslot_of_c),
            jnp.asarray(inp.acslot_of_c),
            jnp.asarray(inp.cbase),
            jnp.asarray(inp.counts),
            jnp.asarray(inp.symbols),
        )

    # --- config corpus: compiled device scan vs native serial scan -----
    configs = [
        ("gray-q85", None, 85, "pil", (120, 200)),
        ("444-q92", "4:4:4", 92, "pil", (96, 144)),
        ("420-q85", "4:2:0", 85, "pil", (128, 192)),
        ("422-q60", "4:2:2", 60, "pil", (112, 160)),
        ("420-q95", "4:2:0", 95, "pil", (80, 120)),
        ("440-q85", "4:4:0", 85, "own", (48, 96)),
    ]
    records = []
    all_ok = True
    for name, mode, q, enc, (h, w) in configs:
        if mode is None:
            img = corpus.synthetic_gray(h, w, seed=7)
            data = corpus.pil_jpeg(img, quality=q)
        elif enc == "own":
            img = corpus.synthetic_rgb(h, w, seed=7)
            data = corpus.own_jpeg(img, subsampling=mode, quality=q).data
        else:
            img = corpus.synthetic_rgb(h, w, seed=7)
            data = corpus.pil_jpeg(img, quality=q, subsampling=mode)
        parsed = parse(data)
        inp = seg_mod.build_spec_scan_input(parsed)
        t0 = time.time()
        bitpos, ok, stats = jax.jit(
            functools.partial(
                sd.device_index_scan,
                used_slots=inp.used_slots, bpm=inp.bpm,
                sb=inp.subseq_bytes, maxrec=inp.maxrec,
                n_mcus=inp.n_mcus, interpret=False,
            )
        )(*scan_args(inp))
        bitpos = np.asarray(bitpos)
        wall = time.time() - t0
        ref_bitpos, ref_dc, _ = en.index_scan(parsed, 1)
        plan_identical = bool(
            ok and np.array_equal(bitpos, ref_bitpos.astype(np.int32))
        )
        # Full engine decode (device DC bases) vs the host pipeline.
        rgb_dev = jt.decode(data, impl="tpu", entropy="device")
        rgb_host = jt.decode(data, impl="host")
        decode_equal = bool(np.array_equal(rgb_dev, rgb_host))
        rec = {
            "config": name, "h": h, "w": w, "quality": q,
            "mode": mode or "gray", "encoder": enc,
            "n_mcus": int(inp.n_mcus),
            "subseq_bytes": int(inp.subseq_bytes),
            "maxrec": int(inp.maxrec),
            "rounds": int(np.asarray(stats)[0]),
            "converged": bool(ok),
            "plan_bit_identical": plan_identical,
            "decode_equal_host": decode_equal,
            "first_run_wall_s": round(wall, 1),
        }
        all_ok &= plan_identical and decode_equal
        records.append(rec)
        print(f"[{name}] {rec}", file=sys.stderr, flush=True)

    # --- fallback contract: forced overflow -> serial scan, same pixels -
    img = corpus.synthetic_rgb(64, 96, seed=3)
    data = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")
    parsed = parse(data)
    real_build = seg_mod.build_spec_scan_input

    def tiny_maxrec(p, **kw):
        inp = real_build(p, **kw)
        inp.maxrec = 1
        return inp

    device_entropy.build_spec_scan_input = tiny_maxrec
    try:
        forced = device_entropy.entropy_decode_device(parsed)
    finally:
        device_entropy.build_spec_scan_input = real_build
    normal = device_entropy.entropy_decode_device(parsed, specsync=False)
    fallback_ok = forced.specsync_stats is None and all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(forced.coefs, normal.coefs)
    )
    all_ok &= fallback_ok
    print(f"[fallback] serial-scan fallback ok={fallback_ok}",
          file=sys.stderr, flush=True)

    # --- 1080p serving numbers ------------------------------------------
    img = corpus.synthetic_rgb(1080, 1920, seed=1)
    data = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")
    parsed = parse(data)
    t0 = time.perf_counter()
    for _ in range(5):
        en.index_scan(parsed, 1)
    serial_ms = (time.perf_counter() - t0) / 5 * 1e3
    inp = seg_mod.build_spec_scan_input(parsed)
    t0 = time.perf_counter()
    for _ in range(5):
        seg_mod.build_spec_scan_input(parsed, subseq_bytes=inp.subseq_bytes)
    build_ms = (time.perf_counter() - t0) / 5 * 1e3

    statics = dict(
        used_slots=inp.used_slots, bpm=inp.bpm, sb=inp.subseq_bytes,
        maxrec=inp.maxrec, n_mcus=inp.n_mcus, interpret=False,
    )

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chained(windows, nbits, dcs, acs, cb, ct, sym, iters):
        def body(_, carry):
            w = windows ^ (carry % 2)
            bitpos, ok, stats = sd.device_index_scan(
                w, nbits, dcs, acs, cb, ct, sym, **statics
            )
            return (jnp.sum(bitpos.astype(jnp.uint32)) % 997 + carry).astype(
                jnp.int32
            )
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    args = scan_args(inp)

    def best(iters, reps=3):
        int(chained(*args, iters=iters))
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chained(*args, iters=iters))
            b = min(b, time.perf_counter() - t0)
        return b

    scan_ms = (best(24) - best(4)) / 20 * 1e3

    artifact = {
        "n_configs": len(records),
        "all_ok": bool(all_ok),
        "fallback_serial_scan_ok": bool(fallback_ok),
        "serving_1080p": {
            "device_scan_ms_per_frame": round(scan_ms, 3),
            "host_window_build_ms": round(build_ms, 2),
            "native_serial_scan_ms_replaced": round(serial_ms, 2),
            "subseq_bytes": int(inp.subseq_bytes),
            "windows_upload_bytes": int(inp.windows.nbytes),
        },
        "backend": jax.default_backend(),
        "configs": records,
        "note": (
            "e2e_no_dri_mpix_per_s (overlapped serving loop through the "
            "device scan) is measured by bench.py and recorded in "
            "BENCH_r05.json's e2e_no_dri_* fields with "
            "e2e_no_dri_impl=device_specsync"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["serving_1080p"]))
    print(f"specsync device artifact -> {out_path}", flush=True)
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
