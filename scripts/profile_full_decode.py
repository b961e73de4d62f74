"""Profile the full on-device decode path stage by stage on the real chip.

Decomposes full decode (entropy kernel -> assemble -> pixel pipeline) via
slope timing (chained iterations inside one jit with a real data
dependency; throughput = slope between two chain lengths, CLAUDE.md
methodology).  Prints a JSON dict of per-stage times for one 1080p 4:2:0
frame.
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
    import jax.numpy as jnp

    from jpeg_gpu_tpu.engine import pipeline
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
    hdr = parsed.header
    spec = pipeline.PipelineSpec.from_header(hdr, exact=True)
    qtables = tuple(
        jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
        for c in hdr.components
    )
    plan = seg_mod.build_plan(parsed)
    streams = jnp.asarray(plan.streams)
    plan_rest = tuple(jnp.asarray(x) for x in plan.kernel_tables)
    geom = tuple((c.hsamp, c.vsamp) for c in hdr.components)
    print(
        f"plan: B={plan.streams.shape[0]} NW={plan.nw} "
        f"T={plan.comp_of_step.shape[0]} nseg={plan.n_segments} "
        f"R={plan.mcus_per_segment}",
        flush=True,
    )

    def chain(body_fn, iters):
        @jax.jit
        def run(streams, *rest):
            def body(_, carry):
                s = streams ^ (carry % 2).astype(jnp.int32)
                return (body_fn(s, *rest) + carry).astype(jnp.int32)
            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))
        return run

    def measure(body_fn, k1=10, k2=60, reps=5):
        f1, f2 = chain(body_fn, k1), chain(body_fn, k2)
        int(f1(streams, *plan_rest))
        int(f2(streams, *plan_rest))
        best1 = best2 = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(f1(streams, *plan_rest))
            best1 = min(best1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(f2(streams, *plan_rest))
            best2 = min(best2, time.perf_counter() - t0)
        return (best2 - best1) / (k2 - k1)

    def kern_only(s, *rest):
        out, err = edev.decode_segments_device(s, *rest)
        return jnp.sum(out.astype(jnp.int32)) % 997 + jnp.sum(err) % 13

    def kern_assemble(s, *rest):
        out, err = edev.decode_segments_device(s, *rest)
        comps = edev.assemble_components(
            out, plan.n_segments, plan.mcus_per_segment,
            hdr.n_mcus, hdr.nhmb, hdr.nvmb, geom,
        )
        acc = jnp.sum(err) % 13
        for c in comps:
            acc = acc + jnp.sum(c.astype(jnp.int32)) % 997
        return acc

    def full(s, *rest):
        out, err = edev.decode_segments_device(s, *rest)
        comps = edev.assemble_components(
            out, plan.n_segments, plan.mcus_per_segment,
            hdr.n_mcus, hdr.nhmb, hdr.nvmb, geom,
        )
        rgb = pipeline.decode_rgb.__wrapped__(spec, comps, qtables)
        return jnp.sum(rgb.astype(jnp.uint32)).astype(jnp.int32) % 997 + jnp.sum(err) % 13

    t_kern = measure(kern_only)
    t_ka = measure(kern_assemble)
    t_full = measure(full)

    mpix = width * height / 1e6
    print(json.dumps({
        "kernel_ms": round(t_kern * 1e3, 3),
        "kernel_plus_assemble_ms": round(t_ka * 1e3, 3),
        "full_ms": round(t_full * 1e3, 3),
        "assemble_ms_est": round((t_ka - t_kern) * 1e3, 3),
        "pipeline_ms_est": round((t_full - t_ka) * 1e3, 3),
        "kernel_mpix_s": round(mpix / t_kern, 1),
        "full_mpix_s": round(mpix / t_full, 1),
    }))


if __name__ == "__main__":
    main()
