"""Measure the speculative parallel index scan prototype on 1080p no-DRI.

The serial native index scan is the DRI-less path's permanent host
bottleneck (~8.3 ms/frame at 1080p).  jpeg_gpu_tpu/host/specsync.py is
the parallel replacement prototyped in numpy in the lockstep form the
TPU kernel would take.  This script measures, on the bench's 1080p
4:2:0 q85 DRI-less stream:

* exactness: bitpos/dc_base/end_bit equal to the native scan's,
* convergence: rounds to the entry fixed point per subsequence size,
* the work model for the device port: rounds x worst-lane steps
  (the kernel's grid cost) vs the serial scan's token count.

Writes SPECSYNC_r*.json at the repo root.

Usage: python scripts/proto_specsync.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "SPECSYNC_r03.json"
    )
    from jpeg_gpu_tpu.host import entropy_native as en
    from jpeg_gpu_tpu.host import specsync
    from jpeg_gpu_tpu.host.parser import parse
    from jpeg_gpu_tpu.testing import corpus

    assert en.available(), "native scan needed as ground truth"
    img = corpus.synthetic_rgb(1080, 1920, seed=1)
    dat = corpus.pil_jpeg(img, quality=85, subsampling="4:2:0")
    par = parse(dat)

    t0 = time.perf_counter()
    bitpos, dc_base, end_bit = en.index_scan(par, 1)
    native_ms = (time.perf_counter() - t0) * 1e3
    stream_bytes = specsync.destuff(par).size

    rows = []
    for sb in (32, 64, 128, 256):
        t0 = time.perf_counter()
        res = specsync.spec_index_scan(par, subseq_bytes=sb, max_rounds=64)
        wall_ms = (time.perf_counter() - t0) * 1e3
        if res is None:
            rows.append({"subseq_bytes": sb, "converged": False})
            continue
        exact = (
            np.array_equal(res.bitpos, bitpos)
            and np.array_equal(res.dc_base, dc_base)
            and res.end_bit == end_bit
        )
        rows.append(
            {
                "subseq_bytes": sb,
                "converged": True,
                "rounds": res.rounds,
                "exact": bool(exact),
                "n_subseq": res.n_subseq,
                "sync_distance_bytes": res.rounds * sb,
                # Device work model: every round costs one lockstep pass
                # bounded by the worst lane's token count; the numpy wall
                # time is NOT the device estimate (it is 1-core python).
                "numpy_wall_ms": round(wall_ms, 1),
            }
        )
        print(rows[-1], file=sys.stderr, flush=True)

    artifact = {
        "geometry": [1080, 1920],
        "quality": 85,
        "subsampling": "4:2:0",
        "n_mcus": int(par.header.n_mcus),
        "stream_bytes": int(stream_bytes),
        "native_scan_ms": round(native_ms, 2),
        "sweeps": rows,
        "all_exact": all(r.get("exact") for r in rows),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0 if artifact["all_exact"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
