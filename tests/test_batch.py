"""Batched corpus decode: bucketing, per-image quant tables, mesh sharding."""

import numpy as np

from jpeg_gpu_tpu import decode
from jpeg_gpu_tpu.engine.batch import decode_batch
from jpeg_gpu_tpu.parallel.mesh import make_mesh
from jpeg_gpu_tpu.testing import corpus


def _corpus():
    datas = []
    # Two geometry buckets x different quality (= different quant tables).
    for q in (70, 85, 95):
        img = corpus.synthetic_rgb(64, 64, seed=q)
        datas.append(corpus.pil_jpeg(img, quality=q, subsampling="4:2:0"))
    for q in (60, 90):
        img = corpus.synthetic_gray(48, 32, seed=q)
        datas.append(corpus.pil_jpeg(img, quality=q))
    return datas


def test_batch_matches_single_decode():
    datas = _corpus()
    outs = decode_batch(datas)
    assert len(outs) == len(datas)
    for data, got in zip(datas, outs):
        ref = decode(data, out="rgb", impl="tpu")
        np.testing.assert_array_equal(got, ref)


def test_batch_sharded_on_mesh():
    datas = _corpus()
    mesh = make_mesh(8, space=2)
    outs = decode_batch(datas, mesh=mesh)
    for data, got in zip(datas, outs):
        ref = decode(data, out="rgb", impl="tpu")
        np.testing.assert_array_equal(got, ref)


def test_batch_sharded_data_only_mesh():
    datas = _corpus()[:3]
    mesh = make_mesh(8, space=1)
    outs = decode_batch(datas, mesh=mesh)
    for data, got in zip(datas, outs):
        np.testing.assert_array_equal(got, decode(data, out="rgb", impl="tpu"))


def test_decode_batch_device_mixed_tables():
    """Corpus device decode: same geometry, different Huffman tables."""
    from jpeg_gpu_tpu.engine.batch import decode_batch_device

    datas = []
    for seed, q in [(0, 70), (1, 92), (2, 85)]:
        img = corpus.synthetic_rgb(48, 64, seed=seed)
        datas.append(
            corpus.pil_jpeg(
                img, quality=q, subsampling="4:2:0", optimize=True,
                restart_marker_blocks=2,
            )
        )
    # Mixed geometry joins its own bucket; no-restart image falls back.
    gray = corpus.synthetic_gray(32, 32, seed=3)
    datas.append(corpus.pil_jpeg(gray, quality=80))
    ref = decode_batch(datas)
    got = decode_batch_device(datas)
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


def test_bucket_key_separates_sampling_factors():
    """Same size + decimations but different sampling factors must not
    share a bucket: 4:4:4 and the all-2x2 fixture have identical
    comp_sizes/comp_decs yet different MCU-aligned block grids."""
    img = corpus.synthetic_rgb(24, 24, seed=7)
    a = corpus.own_jpeg(img, subsampling="4:4:4", quality=85).data
    b = corpus.own_jpeg(img, subsampling="4:4:4-2x2", quality=85).data
    outs = decode_batch([a, b])
    for data, got in zip((a, b), outs):
        ref = decode(data, out="rgb", impl="tpu")
        np.testing.assert_array_equal(got, ref)


def test_decode_batch_device_resident():
    """Device-resident corpus decode: pixels stay on device; values equal
    the with-download path; per-image flags are clean."""
    import jax
    import jax.numpy as jnp  # noqa: F401
    from jpeg_gpu_tpu.engine.batch import (
        decode_batch_device,
        decode_batch_device_resident,
    )

    datas = [
        corpus.pil_jpeg(
            corpus.synthetic_rgb(48, 64, seed=s),
            quality=q, subsampling="4:2:0", optimize=True,
            restart_marker_blocks=1,
        )
        for s, q in [(0, 70), (1, 92), (2, 85)]
    ]
    ref = decode_batch_device(datas)
    rgb, err = decode_batch_device_resident(datas)
    assert isinstance(rgb, jax.Array) and isinstance(err, jax.Array)
    got = np.asarray(rgb)
    assert got.shape == (3, 48, 64, 3)
    for j in range(3):
        np.testing.assert_array_equal(got[j], ref[j])
    assert not np.asarray(err).any()


def test_decode_batch_device_resident_rejects_mixed_buckets():
    import pytest
    from jpeg_gpu_tpu.engine.batch import decode_batch_device_resident

    datas = [
        corpus.pil_jpeg(
            corpus.synthetic_rgb(48, 64, seed=0), quality=85,
            subsampling="4:2:0", restart_marker_blocks=1,
        ),
        corpus.pil_jpeg(
            corpus.synthetic_rgb(32, 32, seed=1), quality=85,
            subsampling="4:2:0", restart_marker_blocks=1,
        ),
    ]
    with pytest.raises(ValueError):
        decode_batch_device_resident(datas)


def test_decode_batch_device_flags_corrupt_image():
    """The reduced per-image error flags still catch corruption."""
    import pytest
    from jpeg_gpu_tpu.engine.batch import decode_batch_device
    from jpeg_gpu_tpu.errors import JpegFormatError
    from jpeg_gpu_tpu.host.parser import parse as _parse

    datas = [
        corpus.pil_jpeg(
            corpus.synthetic_rgb(48, 64, seed=s), quality=85,
            subsampling="4:2:0", restart_marker_blocks=1,
        )
        for s in range(2)
    ]
    # Corrupt image 1 mid-scan: flip bits across a restart segment's data
    # (avoiding 0xFF, which would change marker parsing instead).
    parsed = _parse(datas[1])
    s0, s1 = (int(x) for x in parsed.segments[2])
    bad = bytearray(datas[1])
    for i in range(s0, min(s1, s0 + 16)):
        if bad[i] != 0xFF and bad[i] ^ 0x55 != 0xFF and bad[i - 1] != 0xFF:
            bad[i] ^= 0x55
    datas[1] = bytes(bad)
    try:
        decode_batch_device(datas)
    except JpegFormatError as e:
        assert "image 1" in str(e)
    else:
        # Bit flips can decode to valid (wrong) symbols; accept a clean
        # decode only if values changed nowhere -- practically never.
        pytest.skip("corruption decoded without an invalid code")
