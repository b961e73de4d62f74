"""tpu-jpeg: a TPU-native JPEG decode engine (JAX / XLA / Pallas).

A from-scratch reimagining of negge/jpeg_gpu for TPU pods: baseline (SOF0)
8-bit JPEG decode in which entropy decode produces dense quantized DCT
coefficient tensors, and fused TPU kernels perform dequantization, the 8x8
inverse DCT, chroma upsampling and YCbCr->RGB conversion entirely on device.

Like the reference (jpeg_wrap.h:24-31), the pipeline cut point is an explicit
API axis -- ``pack | quant | dct | yuv | rgb`` -- and multiple backends sit
behind one decoder interface for differential testing.
"""

from jpeg_gpu_tpu.errors import JpegError, JpegFormatError, JpegUnsupportedError
from jpeg_gpu_tpu.info import (
    JpegHeader,
    Component,
    QuantTable,
    HuffmanSpec,
    ScanHeader,
    Subsampling,
)
from jpeg_gpu_tpu.engine.stages import OutputStage
from jpeg_gpu_tpu.engine.decoder import (
    Decoder,
    HostDecoder,
    TpuDecoder,
    PilDecoder,
    get_decoder,
    decode,
    decode_header,
)

__version__ = "0.1.0"

__all__ = [
    "JpegError",
    "JpegFormatError",
    "JpegUnsupportedError",
    "JpegHeader",
    "Component",
    "QuantTable",
    "HuffmanSpec",
    "ScanHeader",
    "Subsampling",
    "OutputStage",
    "Decoder",
    "HostDecoder",
    "TpuDecoder",
    "PilDecoder",
    "get_decoder",
    "decode",
    "decode_header",
]
