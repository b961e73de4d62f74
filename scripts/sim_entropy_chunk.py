"""Host-side simulation of the entropy kernel's AC early-exit chunking.

Decodes a corpus image on the host, walks each block's actual AC symbol
count (symbols + ZRLs + EOB -- exactly the iterations the device AC loop
would retire for that lane), then models the chunked early-exit of
ops/entropy_device.py: per (1024-segment batch, block step), iterations
execute in ``chunk``-sized groups and a group is skipped iff EVERY lane
in the batch already hit EOB (the kernel's one scalar any-active sync).

This bounds the utilization win WITHOUT burning real-TPU compiles
(each distinct chunk value is a distinct Mosaic program, 1-6 min each --
CLAUDE.md).  Prediction for the bench content (1080p 4:2:0 quality-85
synthetic, R=1):

    mean 17.5 AC iterations/block, per-batch-step max ~25-31
    chunk= 4: x2.30   chunk= 8: x2.04   chunk=12: x2.25
    chunk=16: x1.73   chunk=24: x1.57   ideal (chunk->1): x2.46
    length-sorted lane assignment on top of chunk=8: x2.18

so raster-contiguous batches already capture most of the coherence and
length-sorting (which would force a lane un-permute in assembly, the
exact relayout the R=1 fast path exists to avoid) is NOT worth it.

IMPORTANT CONTEXT -- the real-TPU probe (scripts/probe_entropy_chunk.py,
docs/ARCHITECTURE.md headroom map #2) measured the lax.cond chunking as
a LOSS at every granularity (chunk=9: 2.93 ms vs 1.87 baseline; even a
single mid-loop cond is ~67% slower).  This iteration-count model says
the SAVINGS side is real (~2x iterations skippable); the measurement
says the COST side -- the cond as a scheduling barrier that stops the 4
interleaved segment-batch chains overlapping, plus ~70 spilled vector
carries -- dwarfs it, and no per-iteration cost S in this table captures
a barrier that serializes otherwise-overlapped chains.  Keep this script
as the bound on what any future barrier-free early-exit mechanism could
win; do not re-probe lax.cond chunking.

The table also prints the break-even: executed iterations plus
``nsyncs * S`` for a range of per-sync costs S (in iteration
equivalents), since each chunk boundary's any-active reduction +
lax.cond branch has real cost even when the chunk is skipped (dev notes
measured per-ITERATION syncs at ~20x; chunked syncs amortize but do not
erase it).

Usage: python scripts/sim_entropy_chunk.py [H W SUBSAMPLING QUALITY]
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from jpeg_gpu_tpu.host.parser import parse
from jpeg_gpu_tpu.host import entropy as host_entropy
from jpeg_gpu_tpu.host import segments as seg_mod
from jpeg_gpu_tpu.ops.zigzag import DEZIGZAG
from jpeg_gpu_tpu.testing import corpus


def block_ac_iters(natural: np.ndarray) -> int:
    """AC-loop iterations the device kernel retires for one block."""
    zig = natural.reshape(64)[DEZIGZAG]
    it = 0
    k = 1
    while k <= 63:
        nz = np.flatnonzero(zig[k:])
        if nz.size == 0:
            return it + 1  # EOB symbol
        run = int(nz[0])
        it += run // 16 + 1  # ZRLs + the coefficient symbol
        k += run + 1
    return it  # k ran past 63: no EOB symbol


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    sub = sys.argv[3] if len(sys.argv) > 3 else "4:2:0"
    q = int(sys.argv[4]) if len(sys.argv) > 4 else 85

    im = corpus.synthetic_rgb(h, w, seed=1)
    dat = corpus.pil_jpeg(im, quality=q, subsampling=sub, restart_marker_blocks=1)
    par = parse(dat)
    res = host_entropy.decode_scan(par)
    hd = par.header
    plan = seg_mod.build_plan(par)
    r = plan.mcus_per_segment
    scan = hd.scan
    comps = [hd.components[i] for i in scan.comp_idx]
    bpm = sum(c.hsamp * c.vsamp for c in comps)
    t_steps = r * bpm
    nseg = plan.n_segments
    iters = np.zeros((nseg, t_steps), np.int32)
    for m in range(hd.n_mcus):
        seg, pos = divmod(m, r)
        my, mx = divmod(m, hd.nhmb)
        s = pos * bpm
        for ci, c in enumerate(comps):
            arr = res.coefs[scan.comp_idx[ci]]
            for by in range(c.vsamp):
                for bx in range(c.hsamp):
                    iters[seg, s] = block_ac_iters(
                        arr[my * c.vsamp + by, mx * c.hsamp + bx]
                    )
                    s += 1
    print(
        f"config {h}x{w} {sub} q{q} R={r}: mean {iters.mean():.1f} "
        f"AC iters/block, p99 {np.percentile(iters, 99):.0f}"
    )
    nb = -(-nseg // 1024)
    padded = np.concatenate(
        [iters, np.zeros((nb * 1024 - nseg, t_steps), np.int32)]
    )
    batch_max = padded.reshape(nb, 1024, t_steps).max(axis=1)
    base = 63.0 * batch_max.size
    print("chunk  exec_frac  x(S=0)  x(S=1)  x(S=2)  x(S=5)")
    for chunk in (4, 8, 12, 16, 24, 32):
        ex = np.minimum(
            np.maximum(chunk, np.ceil(batch_max / chunk).astype(int) * chunk),
            63,
        )
        nsync = (63 + chunk - 1) // chunk - 1  # conds evaluated, skip or not
        row = [base / (ex.sum() + s * nsync * batch_max.size) for s in (0, 1, 2, 5)]
        print(
            f"{chunk:5d}  {ex.sum() / base:9.3f}  "
            + "  ".join(f"x{v:5.2f}" for v in row)
        )
    ideal = np.minimum(np.maximum(batch_max, 1), 63).sum()
    print(f"ideal  {ideal / base:9.3f}  x{base / ideal:5.2f}")


if __name__ == "__main__":
    main()
