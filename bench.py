"""Benchmark driver: steady-state decode throughput on the local chip.

Methodology mirrors the reference's render loop (jpeg_gpu.c:1228-1461):
repeated decode of one image with an explicit device sync before each
timestamp (their glFinish -> our block_until_ready), reporting
pixels/second.  The headline metric is device-pipeline throughput for the
1080p 4:2:0 config (BASELINE.json config #2), batched for steady state.

``vs_baseline`` is measured against the north-star target share: 2 GPix/s
aggregate on a 16-chip v5e == 125 Mpix/s per chip (the reference itself
publishes no numbers, BASELINE.md).

Prints exactly one JSON line.
"""

from __future__ import annotations

import functools
import json
import sys
import time


def _stage(msg, _t0=[None]):
    """Progress timestamps on stderr (stdout stays one JSON line)."""
    if _t0[0] is None:
        _t0[0] = time.perf_counter()
    print(
        f"[bench +{time.perf_counter() - _t0[0]:7.1f}s] {msg}",
        file=sys.stderr,
        flush=True,
    )


import numpy as np

TARGET_MPIX_PER_CHIP = 125.0  # 2 GPix/s / 16 chips (BASELINE.json)


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the big Pallas programs (the 4-way
    # interleaved entropy kernel especially) cost minutes of XLA time per
    # geometry; cached executables make repeat bench runs start fast.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the cache config: just compile

    # The corpus device-resident serving metric runs FIRST, in a fresh
    # subprocess, BEFORE this process touches the device at all: (a) in
    # this container, executing any large-working-set program or taking
    # one ~12 MB fetch permanently degrades later dispatch/transfer-heavy
    # loops in the same process ~2-4x (CLAUDE.md), and (b) two live
    # device sessions contend badly, so the child must own the chip solo.
    corpus_resident = {}
    if os.environ.get("JPEG_TPU_BENCH_FULL"):
        import subprocess

        _stage("corpus device-resident sustained (fresh subprocess)")
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "scripts", "bench_corpus_resident.py",
                ),
            ],
            stdout=subprocess.PIPE,
            timeout=1200,
        )
        corpus_resident = json.loads(
            proc.stdout.decode().strip().splitlines()[-1]
        )

    from jpeg_gpu_tpu.engine import pipeline
    from jpeg_gpu_tpu.host.entropy import decode_scan
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.testing import corpus

    height, width, batch = 1080, 1920, 8
    img = corpus.synthetic_rgb(height, width, seed=0)
    data = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")

    from jpeg_gpu_tpu.host import entropy_native

    parsed = parse(data)
    use_native = entropy_native.available()
    scan_decode = entropy_native.decode_scan if use_native else decode_scan
    result = scan_decode(parsed)  # warm (native .so build / LUTs)
    t0 = time.perf_counter()
    result = scan_decode(parsed)
    host_entropy_s = time.perf_counter() - t0
    hdr = parsed.header

    # exact (islow, bit-exact) path: measured fastest AND the parity target.
    spec = pipeline.PipelineSpec.from_header(hdr, exact=True)
    qtables = tuple(
        jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
        for c in hdr.components
    )
    # The fused SoA pixel kernel wants parity-split coefficient planes;
    # the native host decoder emits them directly (same stores, different
    # addresses).  Falls back to block layout + the unfused pipeline.
    headline_geom = pipeline.fused_rgb_geometry(spec) if use_native else None
    if headline_geom is not None:
        host_coefs = entropy_native.decode_scan(parsed, soa=True).coefs
    else:
        host_coefs = result.coefs
    coefs = tuple(
        jnp.asarray(np.broadcast_to(c, (batch,) + c.shape).copy())
        for c in host_coefs
    )

    # Measurement methodology (hard-won on this setup):
    #  * One dispatch + scalar fetch through the device tunnel costs ~30 ms
    #    of pure latency, so iterations are chained INSIDE one jit.
    #  * The chain must carry a REAL data dependency into the decode (the
    #    DC perturbation below) and consume the full output via checksum,
    #    or XLA hoists the loop-invariant decode out of the loop and the
    #    measurement is fiction.
    #  * Throughput = slope between two chain lengths, which cancels the
    #    fixed dispatch latency (analogous to the reference timing around
    #    glFinish, jpeg_gpu.c:1439, but latency-corrected).
    # The iteration count is a TRACED argument (fori_loop lowers to a
    # while loop), so one compile serves both chain lengths of the slope
    # measurement -- the compiles, not the runs, dominate bench wall time.
    @jax.jit
    def chained(iters, coefs, qtables):
        def body(_, carry):
            c0 = coefs[0] + (carry % 3).astype(jnp.int16)
            if headline_geom is not None:
                out = pipeline.decode_rgb_soa.__wrapped__(
                    spec, headline_geom, (c0,) + coefs[1:], qtables
                )
            else:
                out = pipeline.decode_rgb.__wrapped__(
                    spec, (c0,) + coefs[1:], qtables
                )
            return (jnp.sum(out.astype(jnp.uint32)) % 997 + carry).astype(
                jnp.uint32
            )

        return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))

    def best_time(fn, iters, *args, reps=3):
        """Best-of-reps wall time of fn(iters, *args); first call warms."""
        it = jnp.int32(iters)
        int(fn(it, *args))  # warm up / compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(fn(it, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = 20, 120
    _stage("headline: compile + measure")
    device_s = (
        best_time(chained, k2, coefs, qtables)
        - best_time(chained, k1, coefs, qtables)
    ) / (k2 - k1)

    # Same config through the fancy-upsampling path (the libjpeg-turbo
    # default pipeline -- the bit-exact parity target).  Routes through
    # the fused kernel's in-kernel triangle filters when available.
    spec_fancy = pipeline.PipelineSpec.from_header(
        hdr, exact=True, upsample="fancy"
    )
    fancy_geom = pipeline.fused_rgb_geometry(spec_fancy)
    use_fused_fancy = fancy_geom is not None and headline_geom is not None
    coefs_fancy = (
        coefs  # the SoA planes serve both kernels
        if use_fused_fancy or headline_geom is None
        else tuple(
            jnp.asarray(np.broadcast_to(c, (batch,) + c.shape).copy())
            for c in result.coefs
        )
    )

    @jax.jit
    def chained_fancy(iters, coefs, qtables):
        def body(_, carry):
            c0 = coefs[0] + (carry % 3).astype(jnp.int16)
            if use_fused_fancy:
                out = pipeline.decode_rgb_soa.__wrapped__(
                    spec_fancy, fancy_geom, (c0,) + coefs[1:], qtables
                )
            else:
                out = pipeline.decode_rgb.__wrapped__(
                    spec_fancy, (c0,) + coefs[1:], qtables
                )
            return (jnp.sum(out.astype(jnp.uint32)) % 997 + carry).astype(
                jnp.uint32
            )
        return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))

    _stage("fancy parity: compile + measure")
    fancy_s = (
        best_time(chained_fancy, 60, coefs_fancy, qtables)
        - best_time(chained_fancy, 10, coefs_fancy, qtables)
    ) / 50

    # Fully on-device decode (device entropy kernel + assembly + pixel
    # pipeline in one jit): the north-star path, measured in the serving
    # shape (``batch`` frames per step).  Needs a restart-heavy stream.
    from jpeg_gpu_tpu.host import segments as seg_mod
    from jpeg_gpu_tpu.ops import entropy_device as edev

    def full_decode_mpix_s(h, w, subsampling, nbatch, k1, k2, upsample="nearest"):
        # One-MCU restart intervals: segment order IS MCU order, so the
        # coefficient assembly needs no lane relayout (the R=1 fast path
        # in assemble_components) -- measured 23% faster than R=2 for the
        # entropy+assembly stage despite the slightly larger grid.
        if subsampling is None:  # grayscale (single component)
            im = corpus.synthetic_gray(h, w, seed=1)
            dat = corpus.pil_jpeg(im, quality=85, restart_marker_blocks=1)
        else:
            im = corpus.synthetic_rgb(h, w, seed=1)
            dat = corpus.pil_jpeg(
                im, quality=85, subsampling=subsampling, restart_marker_blocks=1
            )
        par = parse(dat)
        hd = par.header
        sp = pipeline.PipelineSpec.from_header(
            hd, exact=True, upsample=upsample
        )
        pl = seg_mod.build_plan(par)
        s1 = np.asarray(pl.streams)
        st = jnp.asarray(
            np.broadcast_to(s1, (nbatch,) + s1.shape)
            .reshape((-1,) + s1.shape[1:]).copy()
        )
        rest = tuple(jnp.asarray(x) for x in pl.kernel_tables)
        gm = tuple((c.hsamp, c.vsamp) for c in hd.components)
        qts = tuple(
            jnp.asarray(hd.quant_for(c).values.astype(np.int32))
            for c in hd.components
        )
        fg = pipeline.fused_rgb_geometry(sp)
        nb = s1.shape[0]

        @jax.jit
        def chained_full(iters, st, *rest):
            def body(_, carry):
                s = st ^ (carry % 2).astype(jnp.int32)
                out, err = edev.decode_segments_device(s, *rest)
                pf = out.reshape((nbatch, nb) + out.shape[1:])
                comps = jax.vmap(
                    lambda o: edev.assemble_components(
                        o, pl.n_segments, pl.mcus_per_segment,
                        hd.n_mcus, hd.nhmb, hd.nvmb, gm,
                        soa=fg is not None,
                    )
                )(pf)
                if fg is not None:
                    rgb = pipeline.decode_rgb_soa.__wrapped__(sp, fg, comps, qts)
                else:
                    rgb = pipeline.decode_rgb.__wrapped__(sp, comps, qts)
                return (
                    jnp.sum(rgb.astype(jnp.uint32)) % 997
                    + jnp.sum(err) % 13 + carry
                ).astype(jnp.int32)
            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        sec = (
            best_time(chained_full, k2, st, *rest)
            - best_time(chained_full, k1, st, *rest)
        ) / (k2 - k1)
        return h * w * nbatch / 1e6 / sec

    _stage("full on-device 1080p: compile + measure")
    full_mpix_s = full_decode_mpix_s(1080, 1920, "4:2:0", batch, 5, 35)

    # End-to-end bytes -> pixels with the host side IN the measurement
    # and OVERLAPPED: the host parses + packs frame N+1 while the device
    # decodes frame N (dispatch is async; only the tail blocks).  This is
    # the honest serving number the reference's cpu-ms/gpu-ms split
    # reports (jpeg_gpu.c:1444-1458) -- bench's other numbers isolate the
    # device pipeline.
    def e2e_mpix_s(dat, plan_builder, n_frames=24):
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

        @jax.jit
        def one_frame(st, dcb, *tables):
            out, err = edev.decode_segments_device(st, *tables)
            if dcb is not None:
                # DRI-less pseudo segments: restore DC continuation.
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

        # Tables are per-STREAM constants (Huffman/maps): uploaded once,
        # like a real serving loop would.  Per-frame host work = parse +
        # destuff/pack (+ index scan for DRI-less) + the streams upload.
        tables0 = tuple(jnp.asarray(x) for x in plan0.kernel_tables)
        # Plans take a pinned row width: restart streams skip the native
        # sizing pass, DRI-less streams fuse scan+pack into ONE destuffed
        # pass (segments.build_plan_no_dri nw=...), and the device
        # program geometry stays stable across frames.
        if plan_builder is seg_mod.build_plan:
            plan_builder = functools.partial(seg_mod.build_plan, nw=plan0.nw)
        elif plan_builder is seg_mod.build_plan_auto:
            plan_builder = functools.partial(
                seg_mod.build_plan_auto, nw=plan0.nw
            )

        def host_side():
            par = parse(dat)
            plan = plan_builder(par)
            if plan.dc_base is not None:
                nb = plan.streams.shape[0]
                dcb = np.zeros(
                    (nb * 8 * 128, plan.dc_base.shape[1]), dtype=np.int32
                )
                dcb[: plan.n_segments] = plan.dc_base
                dcb = jnp.asarray(dcb.reshape(nb, 8, 128, -1))
            else:
                dcb = None
            return (jnp.asarray(plan.streams), dcb) + tables0

        rgb, err = one_frame(*host_side())  # warm / compile
        jax.block_until_ready(rgb)
        # Stage breakdown for the artifact: per-frame host work (parse +
        # plan, no device objects) and host+upload (adds the device_put;
        # the tunnel's ~40-130 MB/s effective bandwidth makes this the
        # e2e ceiling in THIS container -- real hosts upload over PCIe).
        def best_of(fn, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best / n_frames * 1e3

        def host_work():
            for _ in range(n_frames):
                plan_builder(parse(dat))

        def upload_work():
            for _ in range(n_frames):
                host_side()

        host_ms = best_of(host_work)
        upload_ms = best_of(upload_work)
        best = float("inf")
        # A 2-deep producer pipeline: the upload thread's blocking waits
        # (device_put through the ~30 ms-latency tunnel) release the GIL,
        # so frame N+1's parse/pack/upload genuinely overlaps frame N's
        # decode even on this 1-core host.
        import queue as queue_mod
        import threading

        for _ in range(2):
            q: "queue_mod.Queue" = queue_mod.Queue(maxsize=2)

            def producer():
                for _ in range(n_frames):
                    q.put(host_side())

            t0 = time.perf_counter()
            th = threading.Thread(target=producer)
            th.start()
            outs = [one_frame(*q.get()) for _ in range(n_frames)]
            th.join()
            jax.block_until_ready(outs)     # drain the tail
            best = min(best, time.perf_counter() - t0)
        mpx = hd.width * hd.height * n_frames / 1e6
        return mpx / best, plan0.streams.nbytes, host_ms, upload_ms

    _stage("e2e bytes->pixels (host parse/pack overlapped)")
    img_e2e = corpus.synthetic_rgb(1080, 1920, seed=1)
    e2e, bits_bytes_frame, e2e_host_ms, e2e_up_ms = e2e_mpix_s(
        corpus.pil_jpeg(
            img_e2e, quality=85, subsampling="4:2:0", restart_marker_blocks=1
        ),
        seg_mod.build_plan,
    )

    # The REAL-WORLD serving case: the same image without restart markers
    # (most JPEGs in the wild).  Default: the DEVICE parallel index scan
    # (ops/specsync_device.py) -- the host only destuffs + uploads window
    # rows (~2 ms/frame) and the TPU finds pseudo-segment boundaries,
    # realigns streams and decodes, all in ONE program.  nw and the
    # window shape are pinned from a first-frame serial scan, the serving
    # contract.  JPEG_TPU_SPECSYNC=0 falls back to the round-3 shape
    # (serial host index scan + host bit pack).
    def e2e_spec_mpix_s(dat, n_frames=12):
        from jpeg_gpu_tpu.ops import specsync_device as sd

        par0 = parse(dat)
        hd = par0.header
        sp = pipeline.PipelineSpec.from_header(hd, exact=True)
        fg = pipeline.fused_rgb_geometry(sp)
        gm = tuple((c.hsamp, c.vsamp) for c in hd.components)
        qts = tuple(
            jnp.asarray(hd.quant_for(c).values.astype(np.int32))
            for c in hd.components
        )
        plan0 = seg_mod.build_plan_no_dri(par0)  # serial scan once: true nw
        inp0 = seg_mod.build_spec_scan_input(par0, nw=plan0.nw)
        sb_pin = inp0.subseq_bytes
        statics = dict(
            used_slots=inp0.used_slots, bpm=inp0.bpm, sb=sb_pin,
            maxrec=inp0.maxrec, n_mcus=inp0.n_mcus, interpret=False,
        )

        @jax.jit
        def one_frame(windows, nbits, *tables):
            dcs, acs, cm, dsm, asm_, smeta, cb, ct, sym = tables
            from jpeg_gpu_tpu.ops import entropy_device as edev2

            bitpos, ok, _stats = sd.device_index_scan(
                windows, nbits, dcs, acs, cb, ct, sym, **statics
            )
            seg_bits = jnp.diff(bitpos, append=nbits.astype(jnp.int32))
            ok = jnp.logical_and(
                ok, jnp.max(seg_bits) + 63 <= inp0.nw * 32
            )
            streams = sd.gather_entropy_streams(
                windows, bitpos, nw=inp0.nw, spw=inp0.spw, nws=inp0.nws
            )
            out, err = edev2.decode_segments_device(
                streams, cm, dsm, asm_, smeta, cb, ct, sym
            )
            dcb = sd.dc_base_from_coefs(out, inp0.t_last)
            out = edev2.apply_dc_base(out, dcb, cm)
            comps = edev2.assemble_components(
                out, inp0.n_mcus, 1, hd.n_mcus, hd.nhmb, hd.nvmb, gm,
                soa=fg is not None,
            )
            if fg is not None:
                rgb = pipeline.decode_rgb_soa.__wrapped__(sp, fg, comps, qts)
            else:
                rgb = pipeline.decode_rgb.__wrapped__(sp, comps, qts)
            return rgb, err, ok

        tables0 = tuple(
            jnp.asarray(x)
            for x in (
                inp0.dcslot_of_c, inp0.acslot_of_c, inp0.comp_of_step,
                inp0.dc_slot_of_step, inp0.ac_slot_of_step, inp0.seg_meta,
                inp0.cbase, inp0.counts, inp0.symbols,
            )
        )

        def host_side():
            par = parse(dat)
            inp = seg_mod.build_spec_scan_input(
                par, subseq_bytes=sb_pin, nw=plan0.nw
            )
            return (
                jnp.asarray(inp.windows),
                jnp.asarray(np.array([inp.n_bits], np.int32)),
            ) + tables0

        rgb, err, ok = one_frame(*host_side())  # warm / compile
        jax.block_until_ready(rgb)
        assert bool(ok), "device specsync did not converge on the bench image"

        def best_of(fn, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best / n_frames * 1e3

        host_ms = best_of(
            lambda: [
                seg_mod.build_spec_scan_input(
                    parse(dat), subseq_bytes=sb_pin, nw=plan0.nw
                )
                for _ in range(n_frames)
            ]
        )
        upload_ms = best_of(
            lambda: [host_side() for _ in range(n_frames)]
        )
        import queue as queue_mod
        import threading

        best = float("inf")
        for _ in range(2):
            q: "queue_mod.Queue" = queue_mod.Queue(maxsize=2)

            def producer():
                for _ in range(n_frames):
                    q.put(host_side())

            t0 = time.perf_counter()
            th = threading.Thread(target=producer)
            th.start()
            outs = [one_frame(*q.get()) for _ in range(n_frames)]
            th.join()
            jax.block_until_ready(outs)
            best = min(best, time.perf_counter() - t0)
        assert all(bool(o[2]) for o in outs)
        mpx = hd.width * hd.height * n_frames / 1e6
        return mpx / best, inp0.windows.nbytes, host_ms, upload_ms

    _stage("e2e DRI-less (device specsync scan + decode)")
    from jpeg_gpu_tpu.host import entropy_native as en_mod

    use_spec = os.environ.get("JPEG_TPU_SPECSYNC", "1") != "0"
    if use_spec and en_mod.available():
        e2e_nodri, _, nodri_host_ms, nodri_up_ms = e2e_spec_mpix_s(
            corpus.pil_jpeg(img_e2e, quality=85, subsampling="4:2:0")
        )
        nodri_impl = "device_specsync"
    elif en_mod.available():
        e2e_nodri, _, nodri_host_ms, nodri_up_ms = e2e_mpix_s(
            corpus.pil_jpeg(img_e2e, quality=85, subsampling="4:2:0"),
            seg_mod.build_plan_auto,
            n_frames=12,
        )
        nodri_impl = "host_serial_scan"
    else:
        e2e_nodri = nodri_host_ms = nodri_up_ms = 0.0
        nodri_impl = "unavailable"
    # BASELINE config #3: 4K 4:2:2, fully on-device decode (batch 2).
    _stage("full on-device 4K 4:2:2: compile + measure")
    mpix4k = full_decode_mpix_s(2160, 3840, "4:2:2", 2, 4, 16)

    # Extended configs (the rest of BASELINE.json's list) are gated behind
    # JPEG_TPU_BENCH_FULL=1: each adds a multi-minute compile, and the
    # headline JSON line must stay affordable for per-round driver runs.
    extended = {}
    if os.environ.get("JPEG_TPU_BENCH_FULL"):
        _stage("extended: 64-image corpus via decode_batch_device")
        from jpeg_gpu_tpu.engine.batch import (
            decode_batch_device,
            decode_batch_device_resident,
        )

        corpus_datas = [
            corpus.pil_jpeg(
                corpus.synthetic_rgb(256, 256, seed=100 + i),
                quality=85,
                subsampling="4:2:0",
                optimize=True,
                restart_marker_blocks=1,
            )
            for i in range(64)
        ]
        # (The device-resident serving metric was measured at the very
        # top of main() in a fresh subprocess, before this process
        # touched the device -- see corpus_resident.)
        extended.update(corpus_resident)
        _stage("extended: corpus with-download (tunnel floor)")
        outs = decode_batch_device(corpus_datas)  # warm/compile
        t_best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = decode_batch_device(corpus_datas)
            t_best = min(t_best, time.perf_counter() - t0)
        assert len(outs) == 64 and outs[0].shape == (256, 256, 3)
        # With-download: bounded by the container tunnel's ~17-60 MB/s
        # pixel readback (12.6 MB/bucket), not by the software -- the
        # device-resident number below is the serving metric.
        extended["corpus_e2e_1core_host_bound_mpix_per_s"] = round(
            64 * 256 * 256 / 1e6 / t_best, 1
        )
        # Device-resident serving: pixels stay in HBM for downstream TPU
        # consumers (the reference's render loop never reads pixels back
        # either).  Sustained over 8 repeated buckets -- host parse/plan
        # of bucket N+1 overlaps device decode of bucket N via async
        # dispatch; per-image error flags checked once at the end.
        # BASELINE config #1: 512x512 grayscale, bit-exact path.
        _stage("extended: 512 grayscale full on-device")
        extended["full_512gray_device_decode_mpix_per_s"] = round(
            full_decode_mpix_s(512, 512, None, 32, 10, 60), 1
        )
        # BASELINE config #5's single-chip half: 8K 4:2:0 decode (the
        # multi-host ICI half is exercised by dryrun_multichip).
        _stage("extended: 8K full on-device")
        extended["full_8k420_device_decode_mpix_per_s"] = round(
            full_decode_mpix_s(4320, 7680, "4:2:0", 1, 3, 9), 1
        )
        # The same frame through the bit-exact fancy path -- h-tiled
        # in-kernel triangle filters + seam repair (round 3; the unfused
        # route measured 2265 Mpix/s at this shape, WIDEFANCY_r03.json).
        _stage("extended: 8K full on-device, fancy")
        extended["full_8k420_fancy_device_decode_mpix_per_s"] = round(
            full_decode_mpix_s(4320, 7680, "4:2:0", 1, 3, 9, upsample="fancy"),
            1,
        )
        # BASELINE config #4's single-chip half: a batched corpus of
        # distinct images (per-image optimized Huffman tables exercise
        # the multi-table kernel) through the public serving API.
        # End-to-end wall time INCLUDING host parse/pack -- on this
        # 1-core container the host side is the bound; real serving
        # hosts scale it across cores.
    _stage("done")

    mpix = width * height * batch / 1e6
    device_mpix_s = mpix / device_s
    host_mpix_s = (width * height / 1e6) / host_entropy_s

    print(
        json.dumps(
            {
                "metric": "device_decode_1080p_420_mpix_per_s",
                "value": round(device_mpix_s, 1),
                "unit": "Mpix/s",
                "vs_baseline": round(device_mpix_s / TARGET_MPIX_PER_CHIP, 3),
                "detail": {
                    "batch": batch,
                    "device_ms_per_batch": round(device_s * 1e3, 3),
                    "fancy_parity_mpix_per_s": round(mpix / fancy_s, 1),
                    "full_on_device_decode_mpix_per_s": round(full_mpix_s, 1),
                    "full_4k422_device_decode_mpix_per_s": round(mpix4k, 1),
                    "e2e_bytes_to_pixels_mpix_per_s": round(e2e, 1),
                    "e2e_no_dri_mpix_per_s": round(e2e_nodri, 1),
                    # Per-frame stage floors under the e2e loops: host
                    # work alone, then host + the tunnel device_put (the
                    # container's upload bandwidth wall; see profile_e2e).
                    "e2e_host_ms_per_frame": round(e2e_host_ms, 2),
                    "e2e_host_upload_ms_per_frame": round(e2e_up_ms, 2),
                    "e2e_no_dri_host_ms_per_frame": round(nodri_host_ms, 2),
                    "e2e_no_dri_host_upload_ms_per_frame": round(
                        nodri_up_ms, 2
                    ),
                    "e2e_no_dri_impl": nodri_impl,
                    # Bytes shipped per frame at the two serving cuts (the
                    # reference's img.packed variable, jpeg_gpu.c:803,1287).
                    "upload_bytes_coefs_frame": int(
                        sum(np.asarray(c).nbytes for c in host_coefs)
                    ),
                    "upload_bytes_bits_frame": int(bits_bytes_frame),
                    "host_entropy_mpix_per_s": round(host_mpix_s, 2),
                    "host_entropy_impl": "native" if use_native else "python",
                    "backend": jax.default_backend(),
                    **extended,
                },
            }
        )
    )


def _supervised() -> int:
    """Run the real bench in a child process; on failure retry once with
    the round-1-validated conservative kernel switches.

    A failed Pallas program can wedge the device for the rest of its
    process (CLAUDE.md), so an in-process retry is unreliable -- the
    supervisor pattern guarantees the driver still gets its one JSON
    line if a newer default lowering regresses on the current toolchain.
    stdout stays exactly the child's JSON line; stderr streams through.
    """
    import os
    import subprocess

    attempts = [
        {},
        # Fallback: post-kernel XLA-transpose pixel store (the round-1
        # serving path) in place of the raster-major in-kernel store.
        {"JPEG_TPU_PIXEL_STORE": "xla"},
    ]
    for i, extra in enumerate(attempts):
        env = dict(os.environ, JPEG_TPU_BENCH_CHILD="1", **extra)
        if extra:
            print(f"[bench] retrying with {extra}", file=sys.stderr, flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE,
                # Extended (FULL) runs add several multi-minute compiles
                # plus the isolated corpus subprocess.
                timeout=4500 if os.environ.get("JPEG_TPU_BENCH_FULL") else 2700,
            )
        except subprocess.TimeoutExpired:
            print(f"[bench] attempt {i} timed out", file=sys.stderr, flush=True)
            continue
        out = proc.stdout.decode().strip()
        if proc.returncode == 0 and out.startswith("{"):
            print(out.splitlines()[-1])
            return 0
        print(
            f"[bench] attempt {i} failed (rc={proc.returncode})",
            file=sys.stderr, flush=True,
        )
    print(
        json.dumps(
            {
                "metric": "device_decode_1080p_420_mpix_per_s",
                "value": 0,
                "unit": "Mpix/s",
                "vs_baseline": 0,
                "detail": {"error": "bench child failed on all attempts"},
            }
        )
    )
    return 1


if __name__ == "__main__":
    import os as _os

    if _os.environ.get("JPEG_TPU_BENCH_CHILD"):
        main()
    else:
        raise SystemExit(_supervised())
