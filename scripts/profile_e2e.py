"""Breakdown of the e2e bytes->pixels serving loop on the real chip.

bench.py's e2e number (96.4 Mpix/s R=1 in BENCH_r02) sits far below the
repo's own host ceiling (~1 GPix/s/core for R=1 host work: parse 0.9 ms +
plan 1.1 ms) and the device pipeline (~0.5 ms/frame) -- so ~19 ms/frame is
unaccounted overhead.  This script isolates where it goes:

  host_only      parse+plan per frame, no device at all
  upload_only    host_side() incl. jnp.asarray(streams) (device_put)
  dispatch_only  one_frame() dispatches on pre-uploaded inputs, drain at end
  overlap_1t     the bench's 2-deep single producer thread (status quo)
  overlap_Nt     N producer threads + unbounded in-flight dispatches

Each phase reports ms/frame.  The tunnel to the chip costs ~30 ms per
blocking round trip (CLAUDE.md), so any per-frame blocking sync shows up
as a ~30 ms floor.

Usage: python scripts/profile_e2e.py [n_frames] [dri|nodri] [threads]
"""

from __future__ import annotations

import json
import os
import queue as queue_mod
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    mode = sys.argv[2] if len(sys.argv) > 2 else "dri"
    nthreads = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from jpeg_gpu_tpu.engine import pipeline
    from jpeg_gpu_tpu.host import segments as seg_mod
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.ops import entropy_device as edev
    from jpeg_gpu_tpu.testing import corpus

    img = corpus.synthetic_rgb(1080, 1920, seed=1)
    if mode == "dri":
        dat = corpus.pil_jpeg(
            img, quality=85, subsampling="4:2:0", restart_marker_blocks=1
        )
        plan_builder = seg_mod.build_plan
    else:
        dat = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")
        plan_builder = seg_mod.build_plan_auto

    par0 = parse(dat)
    hd = par0.header
    sp = pipeline.PipelineSpec.from_header(hd, exact=True)
    fg = pipeline.fused_rgb_geometry(sp)
    gm = tuple((c.hsamp, c.vsamp) for c in hd.components)
    qts = tuple(
        jnp.asarray(hd.quant_for(c).values.astype(np.int32))
        for c in hd.components
    )
    plan0 = plan_builder(par0)
    tables0 = tuple(jnp.asarray(x) for x in plan0.kernel_tables)
    import functools

    if plan_builder is seg_mod.build_plan:
        plan_builder = functools.partial(seg_mod.build_plan, nw=plan0.nw)
    else:
        plan_builder = functools.partial(
            seg_mod.build_plan_auto, nw=plan0.nw
        )

    @jax.jit
    def one_frame(st, dcb, *tables):
        out, err = edev.decode_segments_device(st, *tables)
        if dcb is not None:
            out = edev.apply_dc_base(out, dcb, tables[0])
        comps = edev.assemble_components(
            out, plan0.n_segments, plan0.mcus_per_segment, hd.n_mcus,
            hd.nhmb, hd.nvmb, gm, soa=fg is not None,
        )
        if fg is not None:
            rgb = pipeline.decode_rgb_soa.__wrapped__(sp, fg, comps, qts)
        else:
            rgb = pipeline.decode_rgb.__wrapped__(sp, comps, qts)
        return rgb, err

    def host_plan():
        par = parse(dat)
        plan = plan_builder(par)
        if plan.dc_base is not None:
            nb = plan.streams.shape[0]
            dcb_np = np.zeros((nb * 8 * 128, plan.dc_base.shape[1]), np.int32)
            dcb_np[: plan.n_segments] = plan.dc_base
            dcb_np = dcb_np.reshape(nb, 8, 128, -1)
        else:
            dcb_np = None
        return plan.streams, dcb_np

    def upload(streams_np, dcb_np):
        st = jnp.asarray(streams_np)
        dcb = jnp.asarray(dcb_np) if dcb_np is not None else None
        return (st, dcb) + tables0

    report = {"mode": mode, "n_frames": n_frames}

    # warm / compile
    t0 = time.perf_counter()
    rgb, err = one_frame(*upload(*host_plan()))
    jax.block_until_ready(rgb)
    report["warm_s"] = round(time.perf_counter() - t0, 1)

    def run(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        report[name + "_ms_per_frame"] = round(best / n_frames * 1e3, 2)

    # 1. host work only (no device objects at all)
    run("host_only", lambda: [host_plan() for _ in range(n_frames)])

    # 2. host + upload (does jnp.asarray block on the tunnel?)
    def upload_loop():
        for _ in range(n_frames):
            upload(*host_plan())

    run("upload_only", upload_loop)

    # 2b. upload + blocking ready (is device_put async at all?)
    def upload_sync_loop():
        for _ in range(n_frames):
            jax.block_until_ready(upload(*host_plan())[0])

    run("upload_sync", upload_sync_loop)

    # 3. dispatch-only on ONE pre-uploaded input, drain at the end
    pre = upload(*host_plan())

    def dispatch_loop():
        outs = [one_frame(*pre) for _ in range(n_frames)]
        jax.block_until_ready(outs)

    run("dispatch_only", dispatch_loop)

    # 3b. dispatch with per-frame blocking (the latency floor, ~30 ms?)
    def dispatch_sync_loop():
        for _ in range(n_frames):
            jax.block_until_ready(one_frame(*pre))

    run("dispatch_sync", dispatch_sync_loop)

    # 4. the bench's current loop: 1 producer thread, queue depth 2
    def overlap(nt, depth):
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=depth)
        stop = n_frames

        def producer(k):
            for _ in range(k):
                q.put(upload(*host_plan()))

        def run_once():
            per = [stop // nt] * nt
            per[0] += stop - sum(per)
            ths = [
                threading.Thread(target=producer, args=(k,)) for k in per
            ]
            t0 = time.perf_counter()
            for th in ths:
                th.start()
            outs = [one_frame(*q.get()) for _ in range(stop)]
            for th in ths:
                th.join()
            jax.block_until_ready(outs)
            return time.perf_counter() - t0

        return run_once

    for nt, depth, name in (
        (1, 2, "overlap_1t_d2"),
        (nthreads, 2 * nthreads, f"overlap_{nthreads}t"),
    ):
        fn = overlap(nt, depth)
        best = min(fn(), fn())
        report[name + "_ms_per_frame"] = round(best / n_frames * 1e3, 2)
        report[name + "_mpix_per_s"] = round(
            hd.width * hd.height * n_frames / 1e6 / best, 1
        )

    # 5. G-frame upload batching: the per-transfer tunnel cost (~10 ms,
    # phases 2 vs 1) is FIXED per jnp.asarray call, so stacking G frames'
    # streams into ONE transfer + ONE G-frame dispatch amortizes it.
    G = 4
    nb = plan0.streams.shape[0]

    @jax.jit
    def g_frames(st, dcb, *tables):
        out, err = edev.decode_segments_device(st, *tables)
        if dcb is not None:
            out = edev.apply_dc_base(out, dcb, tables[0])
        pf = out.reshape((G, nb) + out.shape[1:])
        comps = jax.vmap(
            lambda o: edev.assemble_components(
                o, plan0.n_segments, plan0.mcus_per_segment, hd.n_mcus,
                hd.nhmb, hd.nvmb, gm, soa=fg is not None,
            )
        )(pf)
        if fg is not None:
            rgb = pipeline.decode_rgb_soa.__wrapped__(sp, fg, comps, qts)
        else:
            rgb = pipeline.decode_rgb.__wrapped__(sp, comps, qts)
        return rgb, err

    def host_plan_g():
        st_l, dcb_l = [], []
        for _ in range(G):
            s, d = host_plan()
            st_l.append(s)
            dcb_l.append(d)
        st = np.concatenate(st_l, axis=0)
        dcb = None if dcb_l[0] is None else np.concatenate(dcb_l, axis=0)
        return st, dcb

    rgb, err = g_frames(*upload(*host_plan_g()))  # warm / compile
    jax.block_until_ready(rgb)

    n_groups = max(2, n_frames // G)
    for nt in (1, nthreads):
        q2: "queue_mod.Queue" = queue_mod.Queue(maxsize=2 * nt)

        def producer_g(kk):
            for _ in range(kk):
                q2.put(upload(*host_plan_g()))

        best = float("inf")
        for _ in range(2):
            per = [n_groups // nt] * nt
            per[0] += n_groups - sum(per)
            ths = [
                threading.Thread(target=producer_g, args=(kk,)) for kk in per
            ]
            t0 = time.perf_counter()
            for th in ths:
                th.start()
            outs = [g_frames(*q2.get()) for _ in range(n_groups)]
            for th in ths:
                th.join()
            jax.block_until_ready(outs)
            best = min(best, time.perf_counter() - t0)
        nfr = n_groups * G
        report[f"batched_g{G}_{nt}t_ms_per_frame"] = round(
            best / nfr * 1e3, 2
        )
        report[f"batched_g{G}_{nt}t_mpix_per_s"] = round(
            hd.width * hd.height * nfr / 1e6 / best, 1
        )

    print(json.dumps(report))


if __name__ == "__main__":
    main()
