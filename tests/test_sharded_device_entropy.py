"""Distributed fully-on-device decode: segments over ICI, rows over space."""

import numpy as np
import pytest

from jpeg_gpu_tpu import decode
from jpeg_gpu_tpu.engine.device_entropy import decode_image_device_sharded
from jpeg_gpu_tpu.host.parser import parse
from jpeg_gpu_tpu.parallel.mesh import make_mesh
from jpeg_gpu_tpu.testing import corpus


@pytest.mark.parametrize("space", [1, 2])
@pytest.mark.parametrize("upsample", ["nearest", "fancy"])
def test_sharded_device_decode_matches_host(space, upsample):
    img = corpus.synthetic_rgb(128, 128, seed=11)
    enc = corpus.own_jpeg(img, subsampling="4:2:0", quality=85, restart_interval=1)
    parsed = parse(enc.data)
    mesh = make_mesh(8, space=space)
    rgb = decode_image_device_sharded(parsed, mesh, upsample=upsample)
    ref = decode(enc.data, out="rgb", impl="host", upsample=upsample)
    np.testing.assert_array_equal(rgb, ref)


def test_sharded_device_decode_gray():
    img = corpus.synthetic_gray(64, 96, seed=12)
    enc = corpus.own_jpeg(img, quality=80, restart_interval=2)
    parsed = parse(enc.data)
    mesh = make_mesh(8, space=2)
    rgb = decode_image_device_sharded(parsed, mesh)
    ref = decode(enc.data, out="rgb", impl="host")
    np.testing.assert_array_equal(rgb, ref)
