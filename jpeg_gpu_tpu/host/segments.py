"""Host-side preparation for the device entropy decoder.

The TPU kernel (ops/entropy_device.py) decodes 1024 restart segments in
lockstep -- one segment per (sublane, lane) position.  The host's only jobs
(all cheap, byte-level, vectorisable) are:

* destuff each segment (0xFF00 -> 0xFF) and pack it into big-endian u32
  words, 1-padded at the tail (the bit reader contract, spec F.2.2.5),
* lay the words out as (batches, NW, 8, 128): word w of segment
  (b*1024 + s*128 + l) at [b, w, s, l],
* flatten Huffman tables into the kernel's maxcode/delta/symbol tensors.

This is the division of labour SURVEY.md section 7 prescribes: "byte
destuffing and marker scanning are best done host-side"; everything
bit-serial moves to the device.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from jpeg_gpu_tpu.errors import JpegUnsupportedError
from jpeg_gpu_tpu.host.entropy import destuff
from jpeg_gpu_tpu.host.huffman import canonical_codes
from jpeg_gpu_tpu.host.parser import ParsedJpeg
from jpeg_gpu_tpu.info import HuffmanSpec

LANES = 128
SUBLANES = 8
SEGMENTS_PER_BATCH = SUBLANES * LANES  # 1024


@dataclasses.dataclass
class DeviceScanPlan:
    """Everything the device decoder consumes, shape-static."""

    streams: np.ndarray        # (B, NW, 8, 128) int32 big-endian words
    n_segments: int
    nw: int                    # words per segment slot
    mcus_per_segment: int      # R (uniform; last segment may be short)
    n_mcus: int
    # Per block-step tables (T = blocks per segment):
    comp_of_step: np.ndarray   # (T,) int32 frame-component index
    dc_slot_of_step: np.ndarray  # (T,) int32 -> row into table tensors
    ac_slot_of_step: np.ndarray  # (T,) int32
    # Huffman decode tensors, one row per distinct table slot (<= 8):
    maxcode: np.ndarray        # (n_tables, 16) int32 (-1 for empty lengths)
    delta: np.ndarray          # (n_tables, 16) int32 (valptr - mincode)
    symbols: np.ndarray        # (n_tables, 2, 8, 128) int32 (256 syms split
    #                            into 2 lane-tiles, replicated over sublanes)


def _decode_tables(spec: HuffmanSpec) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """maxcode/delta/symbol tensors for canonical decode (spec F.2.2.3)."""
    counts = spec.counts.astype(np.int64)
    maxcode = np.full(16, -1, dtype=np.int32)
    delta = np.zeros(16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        n = int(counts[length - 1])
        if n:
            # valptr = k, mincode = code
            delta[length - 1] = k - code
            maxcode[length - 1] = code + n - 1
        code = (code + n) << 1
        k += n
    syms = np.zeros(256, dtype=np.int32)
    syms[: len(spec.symbols)] = spec.symbols
    tiled = np.broadcast_to(syms.reshape(2, 1, LANES), (2, SUBLANES, LANES))
    return maxcode, delta, np.ascontiguousarray(tiled)


def build_plan(parsed: ParsedJpeg, max_words: int = 1024) -> DeviceScanPlan:
    """Pack a parsed JPEG into the device decoder's input layout."""
    header = parsed.header
    scan = header.scan
    assert scan is not None
    interval = header.restart_interval or header.n_mcus
    nseg = len(parsed.segments)

    # Destuff + word-pack every segment.
    seg_words: List[np.ndarray] = []
    nw = 0
    for s, e in parsed.segments:
        raw = destuff(parsed.data[s:e])
        pad = (-len(raw)) % 4
        raw = raw + b"\xff" * pad
        words = np.frombuffer(raw, dtype=">u4").astype(np.int64)
        seg_words.append(words)
        nw = max(nw, len(words))
    nw += 2  # slack so the refill never reads past a real word mid-peek
    if nw > max_words:
        raise JpegUnsupportedError(
            f"segment too large for device decode ({nw} words > {max_words}); "
            "re-encode with a smaller restart interval or use host entropy"
        )

    nbatch = -(-nseg // SEGMENTS_PER_BATCH)
    streams = np.full(
        (nbatch, nw, SEGMENTS_PER_BATCH), 0xFFFFFFFF, dtype=np.int64
    )
    for i, words in enumerate(seg_words):
        streams[i // SEGMENTS_PER_BATCH, : len(words), i % SEGMENTS_PER_BATCH] = words
    # Reinterpret the u32 bit patterns as int32 (the kernel's word dtype).
    streams = streams.astype(np.uint32).view(np.int32)
    streams = streams.reshape(nbatch, nw, SUBLANES, LANES)

    # Block-step maps (identical for every segment: interleaved MCU order).
    comp_steps: List[int] = []
    dc_steps: List[int] = []
    ac_steps: List[int] = []
    comps = [header.components[i] for i in scan.comp_idx]
    per_mcu = []
    for ci, comp in enumerate(comps):
        per_mcu.extend([(ci, scan.dc_tbl[ci], scan.ac_tbl[ci])] * (comp.hsamp * comp.vsamp))
    for _ in range(interval):
        for ci, dc, ac in per_mcu:
            comp_steps.append(ci)
            dc_steps.append(dc)
            ac_steps.append(ac + 4)  # AC tables in slots 4..7

    # Table tensors: slots 0..3 DC, 4..7 AC.
    n_tables = 8
    maxcode = np.full((n_tables, 16), -1, dtype=np.int32)
    delta = np.zeros((n_tables, 16), dtype=np.int32)
    symbols = np.zeros((n_tables, 2, SUBLANES, LANES), dtype=np.int32)
    for slot, spec in enumerate(list(header.dc_tables) + list(header.ac_tables)):
        if spec is None:
            continue
        m, d, s_ = _decode_tables(spec)
        maxcode[slot] = m
        delta[slot] = d
        symbols[slot] = s_

    return DeviceScanPlan(
        streams=streams,
        n_segments=nseg,
        nw=nw,
        mcus_per_segment=interval,
        n_mcus=header.n_mcus,
        comp_of_step=np.asarray(comp_steps, dtype=np.int32),
        dc_slot_of_step=np.asarray(dc_steps, dtype=np.int32),
        ac_slot_of_step=np.asarray(ac_steps, dtype=np.int32),
        maxcode=maxcode,
        delta=delta,
        symbols=symbols,
    )
