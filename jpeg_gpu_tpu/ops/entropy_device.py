"""Device (TPU) restart-parallel Huffman entropy decoder.

The capability the reference never achieved: its CPU does the Huffman work
every frame (xjpeg_decode_scan, SURVEY.md "north star").  Here the entropy
decode itself runs on the TPU as a Pallas kernel, so the host uploads
*entropy bits* (the pack-mode ideal, README.md:18-20) and the device
produces dense quantized coefficients in HBM.

Architecture (derived from what Mosaic's VPU actually supports -- per-row
lane-shuffle gather on (8, 128) int32 tiles, no scatter, no multi-tile
gather):

* **1024 restart segments decode in lockstep**, one per (sublane, lane)
  position.  Restart segments are independent by construction (bit
  buffer + DC predictors reset, xjpeg.c:613-618), so lanes never
  communicate.
* **Block-lockstep control flow**: the grid walks the segment's block
  sequence (identical MCU-interleaved structure for every segment), so
  the Huffman table of the current step is a *scalar* (SMEM), not a
  per-lane value.  Within a block, a while-loop decodes one symbol per
  iteration for every still-active lane; lanes that hit EOB idle until
  the slowest lane finishes (utilization cost ~2-4x; revisit with
  symbol-lockstep + expansion kernel).
* **Canonical-code rank decode** instead of a 64K LUT: the symbol rank
  is one 16-term sum of independent per-length clamps (no select chain
  -- see decode_symbol), then a single (8,128) lane-shuffle gather of a
  packed (symbol, code-length) entry -- code length is a property of the
  rank in a canonical code, so it needs no scan of its own.
* **64-bit bit window per lane** in two int32 registers, MSB-aligned;
  all shifts are per-lane variable shifts (VPU-native).  Refill fetches
  one 32-bit word per lane via a masked scan over the word axis (the
  only way to express a per-lane row gather today); the stream layout
  (NW, 8, 128) is produced host-side (host/segments.py).
* **No scatter anywhere**: coefficients accumulate into a (64, 8, 128)
  register block via a broadcast one-hot compare (row targets carry the
  de-zig-zag permutation, so output is natural-order for free), and the
  completed block is written densely at its grid step.

Output: (B, T, 64, 8, 128) int16 -- natural-order coefficients of block
step t of segment (b*1024 + s*128 + l) -- plus per-segment error flags.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_gpu_tpu.info import scan_to_frame_order
from jpeg_gpu_tpu.ops.zigzag import DEZIGZAG

LANES = 128
SUBLANES = 8
SEG_SHAPE = (SUBLANES, LANES)

ERR_BAD_CODE = 1
ERR_OVERRUN = 2

_MAX_CONSUME = 31  # code (<=16) + amplitude (<=15) bits per symbol

# AC early-exit sync granularity for the compiled (unrolled) path; 0 until
# scripts/probe_entropy_chunk.py measures a winner on real hardware.
_DEFAULT_CHUNK = 0

# Trace-time ablation switches for kernel profiling (scripts/ablate_*.py):
# comma-separated tokens in JPEG_TPU_ENTROPY_ABLATE disable parts of the
# kernel to attribute time.  Decode output is garbage under ablation; the
# flag exists ONLY for performance archaeology and is never set in tests.
_ABLATE = frozenset(
    t for t in os.environ.get("JPEG_TPU_ENTROPY_ABLATE", "").split(",") if t
)

# Refill word-fetch form: "tree" (default; balanced disjoint-mask sum) or
# "chain" (the round-2 serial select chain, kept for A/B measurement).
# Bit-identical outputs either way; read once at trace time.
_FETCH_FORM = os.environ.get("JPEG_TPU_ENTROPY_FETCH", "tree")

# Two-symbol fused step (round-5 experiment): decode TWO AC symbols per
# unrolled step and merge their accumulates into ONE row sweep, so each
# rows[] register is rewritten once per pair (shorter register dependency
# chains) and the pair's two gathers overlap in flight.  The refill
# cannot pair (a 64-bit window tops up at most one word per symbol), so
# the decode chain itself is unchanged -- this probes whether the merged
# bookkeeping/accumulate wins anything beyond what interleave=4 already
# hides.  Bit-identical outputs (asserted by the probe harness).
_PAIR_FORM = os.environ.get("JPEG_TPU_ENTROPY_PAIR") == "1"

# Accumulate form for the unrolled AC loop: "packed" (two 16-bit
# coefficient rows per int32 register, OR-combined) or "rows" (one int32
# register per row, add-combined -- the round-2 form).
# OR is sound because each AC position is written AT MOST ONCE per block
# (write positions strictly increase within the loop) and the low-16-bit
# pack + arithmetic-shift unpack is exactly the .astype(int16) the output
# takes anyway.  Halves the one-hot row sweep -- the kernel's largest
# single issue-bandwidth cost.  Bit-identical outputs either way
# (tests/test_device_entropy.py); default set by measurement
# (scripts/probe_entropy_chunk.py, 1080p R=1 x8: packed 1.917 ms/batch vs
# rows 2.065 -- a 7.7% kernel win; JPEG_TPU_ENTROPY_ACC=rows for A/B).
_ACC_FORM = os.environ.get("JPEG_TPU_ENTROPY_ACC", "packed")


def _lsr(x, n):
    """Logical shift right with per-lane counts; n must be in [0, 31]."""
    return jax.lax.shift_right_logical(x, n)


def _lsr_safe(x, n):
    """Logical shift right; n in [0, 32] (32 -> 0)."""
    return jnp.where(n >= 32, 0, _lsr(x, jnp.minimum(n, 31)))


def _shl_safe(x, n):
    """Shift left; n in [0, 32] (32 -> 0)."""
    return jnp.where(n >= 32, 0, jnp.left_shift(x, jnp.minimum(n, 31)))


def _gather_lanes(tile, idx):
    """tile (8,128), idx (8,128) in [0,128) -> tile[s, idx[s,l]]."""
    return jnp.take_along_axis(tile, idx, axis=1)


def _entropy_kernel(
    # bound statically via functools.partial:
    unroll,          # bool: unrolled AC loop (compiled) vs fori (interpret)
    interleave,      # int: segment batches decoded per grid step (see below)
    chunk,           # int: AC early-exit sync granularity (0 = never sync)
    # scalar prefetch (SMEM):
    imgmap_ref,      # (B,) int32: image index of segment batch b (tables
    #                  are per image -- corpus batches mix Huffman tables)
    comp_map_ref,    # (T,) int32: frame component of block step t
    dcslot_ref,      # (T,) int32: DC table slot (0..3)
    acslot_ref,      # (T,) int32: AC table slot (4..7)
    segmeta_ref,     # (NI, 3) int32: last segment's (batch, lane, steps)
    cbase3_ref,      # (NI, 8, 16) int32: mincode - 1 per length
    counts3_ref,     # (NI, 8, 17) int32: codes per length + invalid limit
    # tensor inputs (VMEM):
    stream_ref,      # (U, NW, 8, 128) int32: this step's word streams
    symbols4_ref,    # (NI, 8, 8, 128) int32: (sym|len<<8) entries, 2/word
    # outputs:
    out_ref,         # (U, 1, 64, 8, 128) int16: this block step's coefs
    err_ref,         # (U, 8, 128) int32: per-segment error flags
    # scratch:
    state_ref,       # (U, 8, 8, 128) int32: hi, lo, navail, wp, dc0..dc3
):
    t = pl.program_id(1)
    nw = stream_ref.shape[1]

    @pl.when(t == 0)
    def _init():
        state_ref[:] = jnp.zeros((interleave, 8) + SEG_SHAPE, jnp.int32)
        err_ref[:] = jnp.zeros((interleave,) + SEG_SHAPE, jnp.int32)

    # U independent segment batches decode per grid step.  All 1024 lanes
    # of ONE batch advance in lockstep, so a single batch is one serial
    # dependency chain (rank -> gather -> consume -> rank...) and the
    # kernel is latency-bound, not throughput-bound -- measured: ablating
    # the accumulate makes it *slower*, and one lane gather costs ~50
    # cycles of chain latency against ~7 ops of issue width.  Tracing U
    # batches side by side gives the scheduler U independent chains to
    # interleave into the latency bubbles.
    for u in range(interleave):
        _decode_tile(
            unroll, interleave, chunk, u, t, nw,
            imgmap_ref, comp_map_ref, dcslot_ref, acslot_ref, segmeta_ref,
            cbase3_ref, counts3_ref, stream_ref, symbols4_ref,
            out_ref, err_ref, state_ref,
        )


def _decode_tile(
    unroll, interleave, chunk, u, t, nw,
    imgmap_ref, comp_map_ref, dcslot_ref, acslot_ref, segmeta_ref,
    cbase3_ref, counts3_ref, stream_ref, symbols4_ref,
    out_ref, err_ref, state_ref,
):
    """Decode one (8, 128)-segment batch's block step t (sub-batch u)."""
    img = imgmap_ref[pl.program_id(0) * interleave + u]
    # This image's tables, read with full dynamic indices each time
    # (Mosaic rejects .at[] sub-ref views whose minor dims break tiling).

    hi = state_ref[u, 0]
    lo = state_ref[u, 1]
    navail = state_ref[u, 2]
    wp = state_ref[u, 3]

    def fetch_word(wp):
        """Per-lane word gather: word[s,l] = stream[wp[s,l], s, l].

        A masked scan over the word axis -- the only per-lane row gather
        Mosaic can express today.  Statically unrolled for small streams
        (no loop/branch overhead in the hot path), and combined as a
        BALANCED TREE: the wp==w masks are disjoint (at most one word
        matches; overrun lanes match none and fetch 0), so the masked
        terms sum associatively -- depth log2(nw) instead of the nw-deep
        select chain, which sat on every symbol's refill critical path.
        """
        if "nofetch" in _ABLATE:
            return stream_ref[u, 0]
        if (nw <= 512 and unroll) or nw <= 64:
            # Unrolled even at large word counts: a serial fori fetch per
            # symbol measured ~10x slower at nw=146 (R=8 segments).
            if _FETCH_FORM == "chain":  # the round-2 form, kept measurable
                acc = jnp.zeros(SEG_SHAPE, jnp.int32)
                for w in range(nw):
                    acc = jnp.where(wp == w, stream_ref[u, w], acc)
                return acc
            return _tree_sum(
                [
                    jnp.where(wp == w, stream_ref[u, w], 0)
                    for w in range(nw)
                ]
            )

        def body(w, acc):
            return jnp.where(wp == w, stream_ref[u, w], acc)
        return jax.lax.fori_loop(0, nw, body, jnp.zeros(SEG_SHAPE, jnp.int32))

    def refill(window):
        """One masked fetch: tops the 64-bit window back above 32 bits.

        Branch-free (no scalar syncs -- those cost more than the masked
        work).  Invariant: one fetch per symbol keeps navail in [1, 64]
        given <= 31 bits consumed per symbol; peek16 only needs 16.
        """
        hi, lo, navail, wp = window
        w = fetch_word(wp)
        need = navail <= 32
        hi = jnp.where(need, hi | _lsr_safe(w, navail), hi)
        lo = jnp.where(need, lo | _shl_safe(w, 32 - navail), lo)
        navail = jnp.where(need, navail + 32, navail)
        wp = jnp.where(need, wp + 1, wp)
        return hi, lo, navail, wp

    def consume(window, n):
        """Advance the window by n (per-lane, 0 <= n <= 31) bits."""
        hi, lo, navail, wp = window
        hi = _shl_safe(hi, n) | _lsr_safe(lo, 32 - n)
        lo = _shl_safe(lo, n)
        return hi, lo, navail - n, wp

    def _tree_sum(terms):
        """Balanced-tree sum: depth log2(n) instead of a 16-deep chain."""
        while len(terms) > 1:
            nxt = [a + b for a, b in zip(terms[::2], terms[1::2])]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    def decode_symbol(window, slot):
        """Canonical Huffman decode from the next <=16 bits.

        Returns (symbol, code_len); code_len > 16 marks an invalid code.
        The symbol RANK is one sum of independent per-length terms -- the
        canonical-code rank identity (the number of codewords whose
        scaled value is <= the window IS the decoded symbol's table
        position, spec F.2.2.3 DECODE):

          rank = sum_L clamp(topL(window) - cbase[L], 0, counts[L])

        and the code length is a property of the rank, so it rides the
        entry gather (sym | len<<8) instead of its own threshold scan.
        """
        hi = window[0]
        if "nodecode" in _ABLATE:
            return (hi & 0x15) | 1, (hi & 3) + 4
        idx_terms = []
        for length in range(1, 17):
            top = _lsr(hi, 32 - length)
            idx_terms.append(
                jnp.clip(
                    top - cbase3_ref[img, slot, length - 1],
                    0,
                    counts3_ref[img, slot, length - 1],
                )
            )
        idx = jnp.clip(_tree_sum(idx_terms) - 1, 0, 255)
        if "nogather" in _ABLATE:
            return idx & 0x73, (idx & 7) + 2
        # Entries are packed 2 per word (segments.py): one lane gather on
        # idx>>1, then extract half idx&1 with a per-lane variable shift.
        word = _gather_lanes(symbols4_ref[img, slot], _lsr(idx, 1))
        ent = _lsr(word, (idx & 1) * 16) & 0xFFFF
        # Invalid windows saturate the rank at the LAST real code, so they
        # need their own check: beyond every codeword iff the (unsigned)
        # window is >= the table's scaled first-unassigned code.
        bad = (hi ^ jnp.int32(-0x80000000)) >= counts3_ref[img, slot, 16]
        ln = jnp.where(bad, 17, _lsr(ent, 8))
        return ent & 0xFF, ln

    def extract_extend(window, ln, size):
        """Amplitude bits at [ln, ln+size) of the window, EXTENDed."""
        hi = window[0]
        raw = _lsr_safe(jnp.left_shift(hi, jnp.minimum(ln, 31)), 32 - size)
        half = jnp.left_shift(1, jnp.maximum(size - 1, 0))
        full = jnp.left_shift(1, jnp.minimum(size, 30))
        neg = jnp.logical_and(size > 0, raw < half)
        return jnp.where(neg, raw - full + 1, raw)

    window = (hi, lo, navail, wp)
    comp = comp_map_ref[t]
    dc_slot = dcslot_ref[t]
    ac_slot = acslot_ref[t]

    # ---- DC (uniform across lanes) ----
    window = refill(window)
    sym, ln = decode_symbol(window, dc_slot)
    # A DC symbol > 15 is malformed (size field only): flag it like the
    # host decoders do instead of clamping silently.
    bad_dc = jnp.logical_or(ln > 16, sym > 15)
    size = jnp.minimum(sym, 15)
    diff = extract_extend(window, ln, size)
    window = consume(window, jnp.where(bad_dc, 0, ln + size))
    dc = state_ref[u, 4 + comp] + jnp.where(bad_dc, 0, diff)
    state_ref[u, 4 + comp] = dc

    # The accumulator rows stay int32: Mosaic rejects i16 compares
    # outright, and an i16 select/add after an i32 compare measured
    # *slower* than pure i32 (mask relayout dominates any packing win).
    err = err_ref[u] | jnp.where(bad_dc, ERR_BAD_CODE, 0)

    # ---- AC loop: one symbol per iteration for every active lane ----
    # Per-lane active masks: finished lanes do masked no-ops.  Deliberately
    # NOT a while_loop -- the per-iteration any()-reduction and lax.cond
    # scalar syncs measured ~20x slower than running the worst-case
    # iteration count branch-free.
    # Masks carried as int32 (0/1): Mosaic cannot yield i1 vectors.
    def ac_decode(carry):
        """Decode one AC symbol; returns (carry', newk, masked value)."""
        hi, lo, navail, wp, k, active, err = carry
        act = active > 0
        window = refill((hi, lo, navail, wp))
        sym, ln = decode_symbol(window, ac_slot)
        bad = jnp.logical_and(act, ln > 16)
        sym = jnp.where(bad, 0, sym)  # treat as EOB to make progress
        run = _lsr(sym, 4)
        size = sym & 15
        is_eob = sym == 0
        # size==0 is only legal as EOB (0x00) or ZRL (0xF0); anything else
        # is a malformed symbol the host decoders reject.
        badsym = jnp.logical_and(
            jnp.logical_and(act, jnp.logical_not(is_eob)),
            jnp.logical_and(size == 0, run != 15),
        )
        val = extract_extend(window, ln, size)
        newk = k + run + 1
        over = jnp.logical_and(
            jnp.logical_and(act, jnp.logical_not(is_eob)), newk > 63
        )
        write = jnp.logical_and(
            jnp.logical_and(act, size > 0),
            jnp.logical_and(jnp.logical_not(over), jnp.logical_not(is_eob)),
        )
        valw = jnp.where(write, val, 0)
        consumed = jnp.where(
            jnp.logical_and(act, jnp.logical_not(bad)), ln + size, 0
        )
        window = consume(window, consumed)
        k = jnp.where(
            jnp.logical_and(act, jnp.logical_not(is_eob)),
            jnp.minimum(newk, 63),
            k,
        )
        still = jnp.logical_and(
            act, jnp.logical_and(jnp.logical_not(is_eob), k < 63)
        )
        still = jnp.logical_and(still, jnp.logical_not(over))
        still = jnp.logical_and(still, jnp.logical_not(badsym))
        err = (
            err
            | jnp.where(jnp.logical_or(bad, badsym), ERR_BAD_CODE, 0)
            | jnp.where(over, ERR_OVERRUN, 0)
        )
        hi, lo, navail, wp = window
        carry = (hi, lo, navail, wp, k, still.astype(jnp.int32), err)
        return carry, newk, valw

    hi, lo, navail, wp = window
    k0 = jnp.zeros(SEG_SHAPE, jnp.int32)
    active0 = jnp.logical_not(bad_dc).astype(jnp.int32)
    carry = (hi, lo, navail, wp, k0, active0, err)

    if unroll:
        # Fully unrolled Python loop (the compiled-TPU path).  Unrolling
        # measured 2.3x faster than lax.fori_loop (the loop carries spill
        # through memory per iteration), and it buys the *triangular*
        # accumulate: at iteration i every lane's write position
        # newk = k+run+1 >= i+1 (k advances >= 1 per non-EOB symbol), so
        # the one-hot add only touches rows i+1..63 -- half the work of a
        # fixed 64-row sweep, the kernel's largest single cost.
        #
        # _ACC_FORM == "packed" halves that sweep again: rows 2*j2 and
        # 2*j2+1 share one int32 register (low/high 16 bits).  Sound
        # because every nonzero write has a strictly larger position than
        # the previous one in its lane (k advances on every written
        # symbol), so OR never merges two values, and 16 bits lose
        # nothing the final .astype(int16) wasn't already dropping.
        packed = _ACC_FORM == "packed"
        zero = jnp.zeros(SEG_SHAPE, jnp.int32)
        if packed:
            rows = [dc & 0xFFFF] + [zero] * 31
        else:
            rows = [dc] + [zero] * 63

        def run_iters(lo_i, hi_i, carry, rows):
            rows = list(rows)
            if _PAIR_FORM and packed and "noacc" not in _ABLATE:
                i = lo_i
                while i < hi_i:
                    carry, newk1, val1 = ac_decode(carry)
                    if i + 1 < hi_i:
                        carry, newk2, val2 = ac_decode(carry)
                    else:
                        newk2, val2 = None, None
                    j1 = _lsr(newk1, 1)
                    p1 = jnp.left_shift(val1 & 0xFFFF, (newk1 & 1) * 16)
                    if newk2 is not None:
                        j2t = _lsr(newk2, 1)
                        p2 = jnp.left_shift(val2 & 0xFFFF, (newk2 & 1) * 16)
                    # Both symbols' write rows are >= (i+1)//2 (positions
                    # strictly increase), so one merged sweep covers the
                    # pair; each rows[] register is written once.
                    for j2 in range((i + 1) // 2, 32):
                        upd = jnp.where(j1 == j2, p1, 0)
                        if newk2 is not None:
                            upd = upd | jnp.where(j2t == j2, p2, 0)
                        rows[j2] = rows[j2] | upd
                    i += 2
                return carry, tuple(rows)
            for i in range(lo_i, hi_i):
                carry, newk, valw = ac_decode(carry)
                if "noacc" in _ABLATE:
                    carry = carry[:-1] + (carry[-1] + valw,)
                elif packed:
                    # newk >= i+1, so only register pairs (i+1)//2 .. 31
                    # can be hit; newk > 63 (overrun) has valw == 0.
                    j2t = _lsr(newk, 1)
                    payload = jnp.left_shift(valw & 0xFFFF, (newk & 1) * 16)
                    for j2 in range((i + 1) // 2, 32):
                        rows[j2] = rows[j2] | jnp.where(j2t == j2, payload, 0)
                else:
                    for j in range(i + 1, 64):
                        rows[j] = rows[j] + jnp.where(newk == j, valw, 0)
            return carry, tuple(rows)

        if chunk and chunk < 63:
            # Chunked early exit: after the first ``chunk`` iterations run
            # unconditionally (some lane is almost always active there),
            # each further chunk runs under ONE scalar any-active sync for
            # the whole (8, 128) batch.  Most blocks EOB within a few
            # symbols, so with 1024 segments of similar density the later
            # chunks skip entirely; the ~20x per-sync cost the dev notes
            # measured is amortized over ``chunk`` iterations and the 63x
            # worst case stops being the common case.
            carry, rows = run_iters(0, chunk, carry, tuple(rows))
            lo = chunk
            while lo < 63:
                hi_b = min(lo + chunk, 63)
                anyact = jnp.max(carry[5]) > 0
                carry, rows = jax.lax.cond(
                    anyact,
                    functools.partial(run_iters, lo, hi_b),
                    lambda c, r: (c, r),
                    carry, rows,
                )
                lo = hi_b
            rows = list(rows)
        else:
            carry, rows = run_iters(0, 63, carry, tuple(rows))
            rows = list(rows)
        if packed:
            # Unpack: arithmetic shifts sign-extend each 16-bit half --
            # identical to the int16 truncation the output takes.
            unpacked = []
            for j2 in range(32):
                w = rows[j2]
                unpacked.append(
                    jax.lax.shift_right_arithmetic(jnp.left_shift(w, 16), 16)
                )
                unpacked.append(jax.lax.shift_right_arithmetic(w, 16))
            rows = unpacked
        # De-zig-zag for free: emit rows in natural order (a static
        # permutation of the register list at stack time).
        acc = jnp.stack([rows[int(z)] for z in DEZIGZAG])
    else:
        # lax.fori_loop with a dense one-hot accumulate: used in interpret
        # mode (CPU tests), where the unrolled trace is 63x larger for no
        # benefit.  Bit-identical outputs to the unrolled path by
        # construction (same ac_decode; the accumulate targets the same
        # positions) -- asserted by tests/test_device_entropy.py.
        iota64 = jax.lax.broadcasted_iota(jnp.int32, (64,) + SEG_SHAPE, 0)
        acc0 = jnp.where(iota64 == 0, dc[None], 0).astype(jnp.int32)

        def ac_body(_, state):
            carry, acc = state
            carry, newk, valw = ac_decode(carry)
            if "noacc" in _ABLATE:
                carry = carry[:-1] + (carry[-1] + valw,)
            else:
                acc = acc + jnp.where(iota64 == newk[None], valw[None], 0)
            return carry, acc

        carry, acc = jax.lax.fori_loop(0, 63, ac_body, (carry, acc0))
        # De-zig-zag as a static row permutation (no captured constants).
        acc = jnp.stack([acc[int(z)] for z in DEZIGZAG])

    hi, lo, navail, wp, _, _, err = carry

    out_ref[u, 0] = acc.astype(jnp.int16)
    # The last restart segment may be short: its lane decodes padded block
    # steps past the real data, whose flags are meaningless.  Suppress
    # exactly those (lane == last segment, t >= its real step count) so
    # the error flags are trustworthy for EVERY segment.
    lane_lin = (
        jax.lax.broadcasted_iota(jnp.int32, SEG_SHAPE, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, SEG_SHAPE, 1)
    )
    in_tail = jnp.logical_and(
        pl.program_id(0) * interleave + u == segmeta_ref[img, 0],
        t >= segmeta_ref[img, 2],
    )
    suppress = jnp.logical_and(in_tail, lane_lin == segmeta_ref[img, 1])
    err_ref[u] = jnp.where(suppress, err_ref[u], err)
    state_ref[u, 0] = hi
    state_ref[u, 1] = lo
    state_ref[u, 2] = navail
    state_ref[u, 3] = wp


def decode_segments_device_multi(
    streams: jax.Array,       # (B, NW, 8, 128) int32
    img_of_batch: jax.Array,  # (B,) int32: image index of segment batch b
    comp_map: jax.Array,      # (T,) int32
    dcslot_map: jax.Array,    # (T,) int32
    acslot_map: jax.Array,    # (T,) int32
    seg_meta: jax.Array,      # (NI, 3) int32: last segment (batch, lane, steps)
    cbase: jax.Array,         # (NI, 8, 16) int32
    counts: jax.Array,        # (NI, 8, 17) int32 (slot 16: invalid limit)
    symbols: jax.Array,       # (NI, 8, 8, 128) int32, (sym|len<<8) 2/word
    interpret: bool | None = None,
    unroll: bool | None = None,
    interleave: int | None = None,
    ac_chunk: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Device entropy decode with per-image Huffman tables.

    A corpus batch stacks every image's segment batches on the leading
    axis; ``img_of_batch`` routes each batch to its image's tables (the
    block-step maps must be shared -- same geometry bucket).

    Returns (coefs, err): coefs (B, T, 64, 8, 128) int16 natural-order,
    err (B, 8, 128) int32 per-segment error flags (0 = clean).

    ``unroll`` picks the AC-loop form (default: unrolled when compiled,
    fori_loop under interpret); both produce identical coefficients.

    ``interleave`` (U) is the number of segment batches decoded per grid
    step.  One batch is a single serial dependency chain (lockstep lanes)
    and leaves the VPU mostly idle on latency; U independent chains fill
    the bubbles.  Default: up to 4, bounded by B -- measured optimal:
    U=6/8 LOSE at the 1080p R=1 shape (2.00/2.00 ms packed vs 1.92 at
    U=4; register pressure beats the extra chain overlap -- round-3
    probe matrix, scripts/probe_entropy_chunk.py).  B is zero-padded to
    a multiple of U (padded batches decode a zero stream; their rows are
    sliced off before returning).

    ``ac_chunk`` (unrolled path only) groups the 63 AC iterations into
    chunks of that size; every chunk after the first runs under one
    scalar any-active sync, so batches whose 1024 blocks all EOB early
    skip the tail chunks.  0 disables.  Default: measured per
    scripts/probe_entropy_chunk.py (see _DEFAULT_CHUNK), env
    JPEG_TPU_ENTROPY_CHUNK overrides.  Outputs are bit-identical for
    every value.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if unroll is None:
        unroll = not interpret
    if ac_chunk is None:
        env = os.environ.get("JPEG_TPU_ENTROPY_CHUNK")
        ac_chunk = int(env) if env else (_DEFAULT_CHUNK if unroll else 0)
    b, nw = streams.shape[0], streams.shape[1]
    t = comp_map.shape[0]
    if interleave is None:
        interleave = 1 if interpret else min(4, b)
    u = max(1, int(interleave))
    bpad = -(-b // u) * u
    if bpad != b:
        pad = [(0, bpad - b)] + [(0, 0)] * (streams.ndim - 1)
        streams = jnp.pad(streams, pad)
        img_of_batch = jnp.pad(img_of_batch, (0, bpad - b))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(bpad // u, t),
        in_specs=[
            pl.BlockSpec(
                (u, nw, SUBLANES, LANES),
                lambda bi, ti, *_: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (u, 1, 64, SUBLANES, LANES),
                lambda bi, ti, *_: (bi, ti, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (u, SUBLANES, LANES),
                lambda bi, ti, *_: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[pltpu.VMEM((u, 8, SUBLANES, LANES), jnp.int32)],
    )
    coefs, err = pl.pallas_call(
        functools.partial(_entropy_kernel, unroll, u, int(ac_chunk)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bpad, t, 64, SUBLANES, LANES), jnp.int16),
            jax.ShapeDtypeStruct((bpad, SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        img_of_batch, comp_map, dcslot_map, acslot_map, seg_meta,
        cbase, counts, streams, symbols,
    )
    if bpad != b:
        coefs = coefs[:b]
        err = err[:b]
    return coefs, err


def decode_segments_device(
    streams: jax.Array,       # (B, NW, 8, 128) int32
    comp_map: jax.Array,      # (T,) int32
    dcslot_map: jax.Array,    # (T,) int32
    acslot_map: jax.Array,    # (T,) int32
    seg_meta: jax.Array,      # (3,) int32: last segment (batch, lane, steps)
    cbase: jax.Array,         # (8, 16) int32
    counts: jax.Array,        # (8, 17) int32 (slot 16: invalid limit)
    symbols: jax.Array,       # (8, 8, 128) int32, (sym|len<<8) 2/word
    interpret: bool | None = None,
    unroll: bool | None = None,
    interleave: int | None = None,
    ac_chunk: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single-image device entropy decode (tables: DeviceScanPlan.kernel_tables).

    Returns (coefs, err): coefs (B, T, 64, 8, 128) int16 natural-order,
    err (B, 8, 128) int32 per-segment error flags (0 = clean).
    """
    b = streams.shape[0]
    return decode_segments_device_multi(
        streams,
        jnp.zeros((b,), jnp.int32),
        comp_map, dcslot_map, acslot_map, seg_meta[None],
        cbase[None], counts[None], symbols[None],
        interpret=interpret,
        unroll=unroll,
        interleave=interleave,
        ac_chunk=ac_chunk,
    )


@jax.jit
def apply_dc_base(kernel_out, dc_base, comp_map):
    """Add per-pseudo-segment DC predictor bases (DRI-less streams).

    A pseudo restart segment (host/segments.py:build_plan_no_dri) starts
    mid-stream, so its true DC predictors are the running values the
    index scan recorded -- the kernel decoded from 0, which offsets every
    block's cumulative DC in the segment by exactly the base.  One
    broadcast add on coefficient row 0 repairs it.

    kernel_out (B, T, 64, 8, 128) int16; dc_base (B, 8, 128, C) int32;
    comp_map (T,) int32 (frame component of block step t).
    """
    add = jnp.take(dc_base, comp_map, axis=-1)          # (B, 8, 128, T)
    add = jnp.moveaxis(add, -1, 1).astype(jnp.int16)    # (B, T, 8, 128)
    return kernel_out.at[:, :, 0, :, :].add(add)


def assemble_components(
    kernel_out: jax.Array,          # (B, T, 64, 8, 128) int16
    n_segments: int,
    mcus_per_segment: int,
    n_mcus: int,
    nhmb: int,
    nvmb: int,
    comp_geometry: Tuple[Tuple[int, int], ...],  # per SCAN comp (hsamp, vsamp)
    soa: bool = False,
    force_general: bool = False,
    frame_order: Optional[Tuple[int, ...]] = None,
):
    """XLA post-pass: kernel output -> per-component coefficient tensors.

    ``comp_geometry`` follows the scan's component order (the MCU
    interleave).  ``frame_order`` (the scan's ``comp_idx``) reorders the
    output tuple to frame positions for spec-violating out-of-order
    scans; None means scan order == frame order.

    Default layout is (vb, hb, 8, 8) blocks (the QUANT-stage contract).
    With ``soa=True`` each component instead comes out as parity-split
    coefficient planes (vs, hs, 64, nvmb, nhmb) for the fused pixel
    kernel -- same transposes, different axis order, so it costs nothing
    extra.

    Pure reshapes/transposes; the kernels already emit natural-order
    (de-zig-zagged) rows.  Block step order is the MCU-interleaved scan
    order (components in scan order, sub-blocks row-major), identical for
    every segment.

    For one-MCU restart intervals the segment-lane order IS the MCU raster
    order, so the SoA planes need no (sublane, lane) relayout at all --
    only outer-axis moves, which XLA does as plain DMA.  That fast path
    (~10x cheaper than the general lane transpose) activates itself;
    ``force_general`` exists for the differential test.
    """
    b, t = kernel_out.shape[:2]
    nseg_slots = b * SUBLANES * LANES
    bpm = sum(hs * vs for hs, vs in comp_geometry)
    assert t == mcus_per_segment * bpm
    if soa and mcus_per_segment == 1 and not force_general:
        # R=1: segment (b, s, l) holds exactly MCU b*1024 + s*128 + l, and
        # block step t is the block-in-MCU index, so each (t, coef) slice
        # is already a raster-ordered MCU plane.
        assert n_segments == n_mcus
        x = kernel_out.reshape(b, bpm, 64, SUBLANES * LANES)
        x = x.transpose(1, 2, 0, 3).reshape(bpm, 64, nseg_slots)
        x = x[:, :, :n_mcus]
        out = []
        off = 0
        for hs, vs in comp_geometry:
            nb = hs * vs
            yc = x[off : off + nb].reshape(vs, hs, 64, nvmb, nhmb)
            off += nb
            out.append(yc)
        if frame_order is not None:
            out = scan_to_frame_order(out, frame_order)
        return tuple(out)
    x = kernel_out.reshape(b, t, 64, SUBLANES * LANES)
    x = x.transpose(0, 3, 1, 2).reshape(nseg_slots, t, 64)[:n_segments]
    # (nseg, R, bpm, 64) -> (nseg*R mcus, bpm, 64), drop padding MCUs.
    x = x.reshape(n_segments * mcus_per_segment, bpm, 64)
    x = x[:n_mcus]
    out = []
    off = 0
    for hs, vs in comp_geometry:
        nb = hs * vs
        yc = x[:, off : off + nb, :]                      # (n_mcus, vs*hs, 64)
        off += nb
        yc = yc.reshape(nvmb, nhmb, vs, hs, 64)
        if soa:
            # Parity-split coefficient planes (vs, hs, 64, nvmb, nhmb):
            # block (vs*i+pr, hs*k+pc) IS MCU (i, k) sub-block (pr, pc),
            # so the split is just a different axis order of the same
            # transpose -- the layout ops/pixel_fused.py consumes.
            out.append(yc.transpose(2, 3, 4, 0, 1))
        else:
            yc = yc.transpose(0, 2, 1, 3, 4)              # (nvmb, vs, nhmb, hs, 64)
            yc = yc.reshape(nvmb * vs, nhmb * hs, 64)
            out.append(yc.reshape(nvmb * vs, nhmb * hs, 8, 8))
    if frame_order is not None:
        out = scan_to_frame_order(out, frame_order)
    return tuple(out)
