"""Measure the entropy kernel's AC early-exit chunking on the real TPU.

Usage: python scripts/probe_entropy_chunk.py CHUNK [H W SUBSAMPLING BATCH]

One chunk value per process (a crashed Pallas program can wedge the
device).  Slope-measures the ENTROPY KERNEL ONLY (decode + checksum)
on the bench's 1080p 4:2:0 R=1 content, and cross-checks coefficients
against ac_chunk=0 host output for bit-identity.

Round-1 measured context: entropy stage 0.25 ms/frame at 8x1080p with
the 4-way interleave; the 63x unrolled worst case is the target.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    chunk = int(sys.argv[1])
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    sub = sys.argv[4] if len(sys.argv) > 4 else "4:2:0"
    nbatch = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    interleave = int(os.environ.get("JPEG_TPU_PROBE_INTERLEAVE", "0")) or None

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from jpeg_gpu_tpu.host import segments as seg_mod
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.host import entropy as host_entropy
    from jpeg_gpu_tpu.ops import entropy_device as edev
    from jpeg_gpu_tpu.testing import corpus

    im = corpus.synthetic_rgb(h, w, seed=1)
    dat = corpus.pil_jpeg(
        im, quality=85, subsampling=sub, restart_marker_blocks=1
    )
    par = parse(dat)
    plan = seg_mod.build_plan(par)
    s1 = np.asarray(plan.streams)
    st = jnp.asarray(
        np.broadcast_to(s1, (nbatch,) + s1.shape)
        .reshape((-1,) + s1.shape[1:])
        .copy()
    )
    rest = tuple(jnp.asarray(x) for x in plan.kernel_tables)

    # Correctness first: single (non-chained) decode, bit-identical to host.
    out, err = edev.decode_segments_device(
        s1, *[jnp.asarray(x) for x in plan.kernel_tables], ac_chunk=chunk,
        interleave=interleave,
    )
    hd = par.header
    gm = tuple(
        (hd.components[i].hsamp, hd.components[i].vsamp)
        for i in hd.scan.comp_idx
    )
    comps = edev.assemble_components(
        out, plan.n_segments, plan.mcus_per_segment, hd.n_mcus,
        hd.nhmb, hd.nvmb, gm, frame_order=hd.scan.comp_idx,
    )
    ref = host_entropy.decode_scan(par)
    for a, b in zip(comps, ref.coefs):
        np.testing.assert_array_equal(np.asarray(a), b.astype(np.int16))
    # Only real segment slots must be clean (padded lanes decode 0xFF
    # streams and flag, by design).
    flags = np.asarray(err).reshape(-1)[: plan.n_segments]
    assert not flags.any(), np.flatnonzero(flags)[:8]
    print(f"[probe] chunk={chunk}: bit-identical to host", file=sys.stderr)

    @jax.jit
    def chained(iters, st, *rest):
        def body(_, carry):
            s = st ^ (carry % 2).astype(jnp.int32)
            out, err = edev.decode_segments_device(
                s, *rest, ac_chunk=chunk, interleave=interleave
            )
            return (
                jnp.sum(out.astype(jnp.int32)) % 997 + jnp.sum(err) % 13 + carry
            ).astype(jnp.int32)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    def best_time(iters, reps=3):
        it = jnp.int32(iters)
        int(chained(it, st, *rest))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chained(it, st, *rest))
            best = min(best, time.perf_counter() - t0)
        return best

    t0 = time.perf_counter()
    k1, k2 = 5, 35
    sec = (best_time(k2) - best_time(k1)) / (k2 - k1)
    mpix = h * w * nbatch / 1e6
    print(
        json.dumps(
            {
                "chunk": chunk,
                "interleave": interleave,
                "entropy_ms_per_batch": round(sec * 1e3, 3),
                "entropy_mpix_per_s": round(mpix / sec, 1),
                "wall_s": round(time.perf_counter() - t0, 1),
                "config": [h, w, sub, nbatch],
            }
        )
    )


if __name__ == "__main__":
    main()
