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

import json
import time

import numpy as np

TARGET_MPIX_PER_CHIP = 125.0  # 2 GPix/s / 16 chips (BASELINE.json)


def main() -> None:
    import jax
    import jax.numpy as jnp

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
    coefs = tuple(
        jnp.asarray(np.broadcast_to(c, (batch,) + c.shape).copy())
        for c in result.coefs
    )
    qtables = tuple(
        jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
        for c in hdr.components
    )

    # Chain iterations inside one jit with a data dependency and consume the
    # full output via checksum: prevents XLA dead-code elimination and keeps
    # the host/tunnel round-trip out of the steady-state measurement (the
    # analogue of the reference timing around glFinish, jpeg_gpu.c:1439).
    @jax.jit
    def chained(coefs, qtables, iters):
        def body(_, carry):
            c0 = coefs[0] + (carry % 2).astype(jnp.int16) * 0
            out = pipeline.decode_rgb.__wrapped__(
                spec, (c0,) + coefs[1:], qtables
            )
            return jnp.sum(out.astype(jnp.uint32)) + carry

        return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))

    iters = 20
    int(chained(coefs, qtables, iters))  # warm up / compile
    device_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(chained(coefs, qtables, iters))
        device_s = min(device_s, (time.perf_counter() - t0) / iters)

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
                    "host_entropy_mpix_per_s": round(host_mpix_s, 2),
                    "host_entropy_impl": "native" if use_native else "python",
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
