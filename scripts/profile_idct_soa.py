"""Compare exact-IDCT implementations at the bench shape (slope-timed).

Variants per 1080p 4:2:0 batch=8 (Y plane + 2 chroma planes):
  xla_plane   : dequant_idct_islow_plane (current pipeline path)
  pallas_soa  : SoA Pallas kernel, inputs already SoA (full-device case)
  pallas_from_blocks : including the blocks->SoA transpose (host case)
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

    from jpeg_gpu_tpu.host.entropy import decode_scan
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.ops import idct_islow
    from jpeg_gpu_tpu.ops.idct_islow_pallas import (
        blocks_to_soa,
        dequant_idct_islow_plane_soa,
    )
    from jpeg_gpu_tpu.testing import corpus

    height, width, batch = 1080, 1920, 8
    img = corpus.synthetic_rgb(height, width, seed=0)
    data = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")
    parsed = parse(data)
    result = decode_scan(parsed)
    hdr = parsed.header
    coefs = tuple(
        jnp.asarray(np.broadcast_to(c, (batch,) + c.shape).copy())
        for c in result.coefs
    )
    qtables = tuple(
        jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
        for c in hdr.components
    )
    # Pre-pad vb to a multiple of 8 for the banded kernel, pre-make SoA.
    def pad_vb(c):
        vb = c.shape[1]
        pad = (-vb) % 8
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        return c

    coefs_p = tuple(pad_vb(c) for c in coefs)
    soa = tuple(jnp.asarray(np.asarray(blocks_to_soa(c))) for c in coefs_p)

    def chain(body_fn, args, iters):
        @jax.jit
        def run(*a):
            def body(_, carry):
                a0 = a[0] + (carry % 3).astype(a[0].dtype)
                out = body_fn((a0,) + a[1:])
                return (out % 997 + carry).astype(jnp.uint32)
            return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))
        return run

    def measure(body_fn, args, k1=10, k2=60, reps=5):
        f1 = chain(body_fn, args, k1)
        f2 = chain(body_fn, args, k2)
        int(f1(*args)); int(f2(*args))
        b1 = b2 = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); int(f1(*args)); b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter(); int(f2(*args)); b2 = min(b2, time.perf_counter() - t0)
        return (b2 - b1) / (k2 - k1)

    def xla_plane(a):
        cs = a[:3]
        acc = jnp.zeros((), jnp.uint32)
        for c, q in zip(cs, qtables):
            p = idct_islow.dequant_idct_islow_plane(c, q)
            acc = acc + jnp.sum(p.astype(jnp.uint32))
        return acc

    def pallas_soa(a):
        cs = a[:3]
        acc = jnp.zeros((), jnp.uint32)
        for c, q in zip(cs, qtables):
            p = dequant_idct_islow_plane_soa(c, q)
            acc = acc + jnp.sum(p.astype(jnp.uint32))
        return acc

    def pallas_from_blocks(a):
        cs = a[:3]
        acc = jnp.zeros((), jnp.uint32)
        for c, q in zip(cs, qtables):
            p = dequant_idct_islow_plane_soa(blocks_to_soa(c), q)
            acc = acc + jnp.sum(p.astype(jnp.uint32))
        return acc

    t_xla = measure(xla_plane, coefs_p)
    t_soa = measure(pallas_soa, soa)
    t_blk = measure(pallas_from_blocks, coefs_p)

    print(json.dumps({
        "batch": batch,
        "xla_plane_ms": round(t_xla * 1e3, 3),
        "pallas_soa_ms": round(t_soa * 1e3, 3),
        "pallas_from_blocks_ms": round(t_blk * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
