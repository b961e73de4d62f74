"""Device parallel index scan (ops/specsync_device.py), interpret mode.

The DRI-less serving path's parallel boundary finder must be bit-exact
against the serial native scan (the prototype's contract, host/specsync.py
+ SPECSYNC_r03.json) and fall back to it transparently when it cannot
converge.  Compiled-kernel coverage runs on real hardware via
scripts/sweep_differential.py (r=0 configs through entropy="device") and
scripts/specsync_device_artifact.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from jpeg_gpu_tpu.engine import device_entropy
from jpeg_gpu_tpu.engine.device_entropy import entropy_decode_device
from jpeg_gpu_tpu.errors import JpegUnsupportedError
from jpeg_gpu_tpu.host import entropy_native
from jpeg_gpu_tpu.host import segments as seg_mod
from jpeg_gpu_tpu.host.parser import parse
from jpeg_gpu_tpu.ops import specsync_device as sd
from jpeg_gpu_tpu.testing import corpus


def _scan_args(inp):
    return (
        jnp.asarray(inp.windows),
        jnp.asarray(np.array([inp.n_bits], np.int32)),
        jnp.asarray(inp.dcslot_of_c),
        jnp.asarray(inp.acslot_of_c),
        jnp.asarray(inp.cbase),
        jnp.asarray(inp.counts),
        jnp.asarray(inp.symbols),
    )


@pytest.mark.parametrize(
    "mode,q", [("4:2:0", 85), ("4:4:4", 92), (None, 75)]
)
def test_device_index_scan_matches_native(mode, q):
    """Converged device bitpos == the serial native index scan, bit for
    bit, across subsampling modes and a forced-small subsequence size
    (more rounds of the fixed point)."""
    if not entropy_native.available():
        pytest.skip("native library unavailable")
    if mode is None:
        img = corpus.synthetic_gray(56, 72, seed=9)
        data = corpus.pil_jpeg(img, quality=q)
    else:
        img = corpus.synthetic_rgb(56, 72, seed=9)
        data = corpus.pil_jpeg(img, quality=q, subsampling=mode)
    parsed = parse(data)
    inp = seg_mod.build_spec_scan_input(parsed, subseq_bytes=32)
    bitpos, ok, stats = sd.device_index_scan(
        *_scan_args(inp),
        used_slots=inp.used_slots, bpm=inp.bpm, sb=inp.subseq_bytes,
        maxrec=inp.maxrec, n_mcus=inp.n_mcus, interpret=True,
    )
    assert bool(ok), np.asarray(stats)
    ref_bitpos, _, _ = entropy_native.index_scan(parsed, 1)
    np.testing.assert_array_equal(
        np.asarray(bitpos), ref_bitpos.astype(np.int32)
    )


@pytest.mark.parametrize("mode", ["4:2:0", "4:2:2"])
def test_spec_engine_path_matches_serial(mode):
    """entropy_decode_device's device-specsync path (DC bases derived from
    the decode itself) == the serial host-scan path, coefficient-exact."""
    img = corpus.synthetic_rgb(48, 64, seed=3)
    data = corpus.pil_jpeg(img, quality=85, subsampling=mode)
    parsed = parse(data)
    a = entropy_decode_device(parsed, interpret=True)
    b = entropy_decode_device(parsed, interpret=True, specsync=False)
    assert a.specsync_stats is not None  # the spec path actually ran
    assert b.specsync_stats is None
    for x, y in zip(a.coefs, b.coefs):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_spec_path_skipped_for_restart_streams():
    img = corpus.synthetic_rgb(48, 48, seed=7)
    data = corpus.pil_jpeg(
        img, quality=85, subsampling="4:2:0", restart_marker_blocks=1
    )
    parsed = parse(data)
    res = entropy_decode_device(parsed, interpret=True)
    assert res.specsync_stats is None


def test_spec_overflow_falls_back_to_serial(monkeypatch):
    """A stream denser than maxrec's coverage flags overflow; the engine
    must transparently decode via the serial scan instead."""
    img = corpus.synthetic_rgb(48, 64, seed=3)
    data = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")
    parsed = parse(data)
    real_build = seg_mod.build_spec_scan_input

    def tiny_maxrec(parsed, **kw):
        inp = real_build(parsed, **kw)
        inp.maxrec = 1  # every lane with >1 MCU start overflows
        return inp

    monkeypatch.setattr(
        device_entropy, "build_spec_scan_input", tiny_maxrec
    )
    a = entropy_decode_device(parsed, interpret=True)
    assert a.specsync_stats is None  # fell back
    b = entropy_decode_device(parsed, interpret=True, specsync=False)
    for x, y in zip(a.coefs, b.coefs):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_spec_unsupported_size_falls_back(monkeypatch):
    img = corpus.synthetic_rgb(48, 64, seed=3)
    data = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")
    parsed = parse(data)

    def raise_unsupported(parsed, **kw):
        raise JpegUnsupportedError("forced")

    monkeypatch.setattr(
        device_entropy, "build_spec_scan_input", raise_unsupported
    )
    a = entropy_decode_device(parsed, interpret=True)
    assert a.specsync_stats is None
    b = entropy_decode_device(parsed, interpret=True, specsync=False)
    for x, y in zip(a.coefs, b.coefs):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_full_rgb_decode_via_spec_path():
    """Public API: DRI-less entropy='device' (now the spec path) == the
    host pipeline's RGB, end to end."""
    import jpeg_gpu_tpu as jt

    img = corpus.synthetic_rgb(41, 67, seed=11)  # odd dims on purpose
    data = corpus.pil_jpeg(img, quality=88, subsampling="4:2:0")
    dev = jt.decode(data, impl="tpu", entropy="device")
    host = jt.decode(data, impl="host")
    np.testing.assert_array_equal(dev, host)
