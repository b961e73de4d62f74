"""Interpret-mode coverage of the fused pixel kernel body (ADVICE r1 #2).

The production pipeline never routes through the fused Pallas kernel on
the CPU backend (fused_rgb_geometry returns None), so without this test
the kernel body had zero CPU CI coverage.  One tiny 4:2:2 fancy config
(the cheapest kernel variant to emulate, ~1.5 min) exercises the IDCT
planes, the in-kernel triangle filters, the sample-edge clamps and the
word packing; the full mode matrix runs on real hardware via
`python -m jpeg_gpu_tpu.ops.pixel_fused` and scripts/sweep_differential.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from jpeg_gpu_tpu.engine import pipeline
from jpeg_gpu_tpu.host.entropy import decode_scan
from jpeg_gpu_tpu.host.parser import parse
from jpeg_gpu_tpu.ops.idct_islow_pallas import blocks_to_soa
from jpeg_gpu_tpu.ops.pixel_fused import (
    blocks_to_soa_split,
    decode_rgb_fused_soa,
)
from jpeg_gpu_tpu.testing import corpus


@pytest.mark.slow  # ~1.5 min: interpret-mode fused pixel kernel body
def test_fused_kernel_interpret_fancy_422():
    img = corpus.synthetic_rgb(18, 22, seed=4)
    enc = corpus.own_jpeg(img, subsampling="4:2:2", quality=85)
    parsed = parse(enc.data)
    hdr = parsed.header
    res = decode_scan(parsed)
    spec = pipeline.PipelineSpec.from_header(hdr, exact=True, upsample="fancy")
    coefs = tuple(jnp.asarray(c) for c in res.coefs)
    qts = tuple(
        jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
        for c in hdr.components
    )
    ref = np.asarray(pipeline.decode_rgb(spec, coefs, qts))
    y_soa = blocks_to_soa_split(coefs[0], 2, 1)
    qtc = jnp.stack([qts[1].reshape(64), qts[2].reshape(64)])
    rgb = decode_rgb_fused_soa(
        y_soa, blocks_to_soa(coefs[1]), blocks_to_soa(coefs[2]),
        qts[0], qtc, 2, 1,
        fancy=True, chroma_true=spec.comp_sizes[1],
    )
    got = np.asarray(rgb)[: hdr.height, : hdr.width]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow  # ~1 min: two h-tiles through the interpret kernel
def test_fused_kernel_interpret_fancy_wide_seam_repair():
    """Fancy wider than one 256-lane h-tile (round 3): the kernel runs
    per tile with locally-replicated seam edges and decode_rgb_soa's
    strip repair recomputes the 2 wrong columns per seam -- the whole
    frame must equal the unfused reference bit-exactly, including the
    seam columns and the true right edge living amid grid padding."""
    img = corpus.synthetic_rgb(10, 4130, seed=6)
    enc = corpus.pil_jpeg(img, quality=85, subsampling="4:2:2")
    parsed = parse(enc)
    hdr = parsed.header
    res = decode_scan(parsed)
    spec = pipeline.PipelineSpec.from_header(hdr, exact=True, upsample="fancy")
    coefs = tuple(jnp.asarray(c) for c in res.coefs)
    qts = tuple(
        jnp.asarray(hdr.quant_for(c).values.astype(np.int32))
        for c in hdr.components
    )
    ref = np.asarray(pipeline.decode_rgb(spec, coefs, qts))
    comps = (
        blocks_to_soa_split(coefs[0], 2, 1),
        blocks_to_soa(coefs[1])[None, None],
        blocks_to_soa(coefs[2])[None, None],
    )
    got = np.asarray(
        pipeline.decode_rgb_soa.__wrapped__(spec, (2, 1), comps, qts)
    )
    np.testing.assert_array_equal(got, ref)
