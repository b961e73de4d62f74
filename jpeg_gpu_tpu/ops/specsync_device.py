"""Device (TPU) speculative self-synchronizing parallel index scan.

The last serial per-frame bottleneck of the DRI-less serving path is the
host index scan: one Huffman-walk dependency chain over the whole entropy
stream to find pseudo-segment bit offsets (~8.5 ms/frame at 1080p,
xjpeg_host.cpp:xjpeg_index_scan; its behavior spec descends from the
reference's serial CPU walk, /root/reference/src/xjpeg.c:449-632).  This
module moves that scan onto the TPU as the Pallas port of the numpy
prototype in host/specsync.py (bit-exact convergence measured in
SPECSYNC_r03.json), so the host's only per-frame work is destuffing and
one strided window copy.

Algorithm (see host/specsync.py for the full derivation):

* The destuffed stream splits into S fixed-size subsequences (SB bytes),
  one per (sublane, lane) slot -- the same lockstep layout as the restart
  decoder (ops/entropy_device.py).
* A Jacobi fixed-point iteration on subsequence ENTRY states (bit pos,
  block-in-MCU phase c, at_dc, zigzag k): each round decodes every
  subsequence from its current entry to its first token boundary past the
  subsequence end; round r+1's entry of s+1 is round r's exit of s, with
  entry 0 pinned to the true scan start.  At the fixed point the chain IS
  the serial decode by induction; Huffman self-synchronization only
  bounds how fast the fixed point arrives (~1+sync_distance/SB rounds).
  The rounds run as a lax.while_loop around one Pallas kernel, so
  convergence is detected, not assumed, and early convergence costs
  nothing.
* A final "enumerate" pass re-decodes once from the converged entries and
  records each lane's MCU-start bit positions into ``maxrec`` one-hot
  register rows (Mosaic has no scatter); an XLA scatter + exclusive
  cumsum stitches them into the global per-MCU ``bitpos``.
* Unlike the prototype, NO DC predictor sums are tracked: with R=1
  pseudo segments the restart decoder's own output already contains each
  segment's total DC diff (coefficient row 0 of each component's last
  block step), so the per-segment DC bases are one exclusive cumsum of
  kernel output (``dc_base_from_coefs``) -- the scan kernel decodes code
  lengths and phases only, never amplitudes.
* The per-MCU entropy streams the restart decoder consumes are then
  built ON DEVICE: one XLA gather pulls each segment's words from the
  uploaded window tensor at ``bitpos[m] >> 5`` and a per-lane variable
  shift bit-aligns them (``gather_entropy_streams``) -- no second host
  pass, no per-frame bit-shifting on the CPU.

The one structural cost vs the restart kernel: the Huffman table slot is
PER-LANE here (lanes sit at arbitrary block phases), so the rank decode's
per-length constants become masked sums over the (static) used-slot list
and the entry lookup needs one lane-gather per used slot, instead of SMEM
scalars and a single gather.  That is why this stays a boundary finder
and the coefficient decode keeps the block-lockstep kernel.

Failure handling mirrors the prototype: non-convergence within
``max_rounds``, record overflow, or fewer records than MCUs set a flag
the host checks AFTER the (async) decode; the caller then falls back to
the serial native scan.  A converged clean run is bit-identical to the
serial scan by construction (asserted in tests and the differential
sweep).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_gpu_tpu.ops.entropy_device import (
    LANES,
    SEG_SHAPE,
    SUBLANES,
    _gather_lanes,
    _lsr,
    _lsr_safe,
    _shl_safe,
)

SLOTS_PER_BATCH = SUBLANES * LANES  # 1024

# In-kernel iterations per any-active scalar sync (compiled path): the
# ~20x per-sync cost (CLAUDE.md) is amortized over the chunk while early
# EOB-dense batches still skip most of the 8*SB worst case.
_CHUNK = 16


def _tree_sum(terms):
    """Balanced-tree sum: depth log2(n) instead of an n-deep chain."""
    while len(terms) > 1:
        nxt = [a + b for a, b in zip(terms[::2], terms[1::2])]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _scan_kernel(
    # bound statically via functools.partial:
    record,        # bool: enumerate pass (records MCU starts) vs sync pass
    used_slots,    # tuple[int]: table slots this scan can reference
    bpm,           # int: blocks per MCU
    sb,            # int: subsequence bytes
    maxrec,        # int: record rows (enumerate pass)
    unroll,        # bool: chunked while (compiled) vs bounded fori (interpret)
    # scalar prefetch (SMEM):
    nbits_ref,     # (1,) i32: real stream bits (lanes past it never activate)
    dcslot_ref,    # (bpm,) i32: DC table slot of block phase c
    acslot_ref,    # (bpm,) i32: AC table slot of block phase c
    cbase_ref,     # (8, 16) i32: mincode-1 per length (segments._decode_tables)
    counts_ref,    # (8, 17) i32: codes per length + invalid-window limit
    # tensor inputs (VMEM):
    windows_ref,   # (1, NWS, 8, 128) i32: this batch's per-lane word windows
    entry_ref,     # (1, 4, 8, 128) i32: entry state rows p, c, at_dc, k
    symbols_ref,   # (8, 8, 128) i32: packed (sym|len<<8) entries, 2 per word
    # outputs:
    exit_ref,      # (1, 4, 8, 128) i32: exit state rows (k normalized by XLA)
    *rec_refs,     # record only: (1, maxrec, 8, 128) positions, (1, 1, 8, 128) n
):
    nws = windows_ref.shape[1]
    bi = pl.program_id(0)
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, SEG_SHAPE, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, SEG_SHAPE, 1)
    )
    sb_bits = sb * 8
    # Per-lane decode end (bits, relative to the lane's own window start).
    # Padding lanes past the stream get end <= 0 and never activate.
    end = jnp.minimum(sb_bits, nbits_ref[0] - (bi * SLOTS_PER_BATCH + lane) * sb_bits)

    def fetch_word(wp):
        """Per-lane word fetch from this lane's own window row.

        Same disjoint-mask balanced tree as the restart kernel's refill
        (at most one word index matches; out-of-range fetches 0, which is
        harmless -- only finished or off-true-path lanes overrun)."""
        return _tree_sum(
            [jnp.where(wp == w, windows_ref[0, w], 0) for w in range(nws)]
        )

    def decode_symbol(hi, slot_eqs):
        """Canonical rank decode with a PER-LANE table slot.

        Identical arithmetic to entropy_device.decode_symbol, but the
        per-length constants are masked sums over the used slots (the
        eq masks are exclusive: a lane's slot matches exactly one) and
        the packed-entry gather runs once per used slot."""
        idx_terms = []
        for length in range(1, 17):
            top = _lsr(hi, 32 - length)
            cb = _tree_sum(
                [
                    jnp.where(eq, cbase_ref[s, length - 1], 0)
                    for s, eq in slot_eqs
                ]
            )
            ct = _tree_sum(
                [
                    jnp.where(eq, counts_ref[s, length - 1], 0)
                    for s, eq in slot_eqs
                ]
            )
            idx_terms.append(jnp.clip(top - cb, 0, ct))
        idx = jnp.clip(_tree_sum(idx_terms) - 1, 0, 255)
        half = _lsr(idx, 1)
        ent = _tree_sum(
            [
                jnp.where(eq, _gather_lanes(symbols_ref[s], half), 0)
                for s, eq in slot_eqs
            ]
        )
        ent = _lsr(ent, (idx & 1) * 16) & 0xFFFF
        lim = _tree_sum(
            [jnp.where(eq, counts_ref[s, 16], 0) for s, eq in slot_eqs]
        )
        bad = (hi ^ jnp.int32(-0x80000000)) >= lim
        ln = jnp.where(bad, 17, _lsr(ent, 8))
        sym = jnp.where(jnp.logical_or(bad, ln > 16), 0, ent & 0xFF)
        ln = jnp.where(ln > 16, 17, ln)
        return sym, ln

    # ---- init: build the 64-bit window at the (arbitrary) entry bit ----
    p = entry_ref[0, 0]
    c = entry_ref[0, 1]
    at_dc = entry_ref[0, 2]
    k = entry_ref[0, 3]
    wp0 = _lsr(p, 5)
    sh = p & 31
    w0 = fetch_word(wp0)
    w1 = fetch_word(wp0 + 1)
    hi = jnp.left_shift(w0, sh) | _lsr_safe(w1, 32 - sh)
    lo = _shl_safe(w1, sh)
    navail = 64 - sh
    wp = wp0 + 2

    def step(state):
        """One lockstep symbol decode over all lanes (masked no-ops when
        inactive) -- the Pallas port of specsync._SpecDecoder.run_round's
        loop body, minus amplitude/DC-sum tracking (not needed here)."""
        p, c, at_dc, k, hi, lo, navail, wp = state[:8]
        act = p < end
        if record:
            recn = state[8]
            rec = list(state[9:])
            is_mcu = jnp.logical_and(jnp.logical_and(act, at_dc > 0), c == 0)
            for j in range(maxrec):
                rec[j] = jnp.where(
                    jnp.logical_and(is_mcu, recn == j), p, rec[j]
                )
            recn = recn + is_mcu.astype(jnp.int32)
        # Refill: one masked fetch tops the window back above 32 bits.
        w = fetch_word(wp)
        need = navail <= 32
        hi = jnp.where(need, hi | _lsr_safe(w, navail), hi)
        lo = jnp.where(need, lo | _shl_safe(w, 32 - navail), lo)
        navail = jnp.where(need, navail + 32, navail)
        wp = jnp.where(need, wp + 1, wp)
        # Per-lane table slot from the block phase (static select chains
        # over the <= bpm phases; SMEM scalars broadcast).
        dcs = _tree_sum([jnp.where(c == j, dcslot_ref[j], 0) for j in range(bpm)])
        acs = _tree_sum([jnp.where(c == j, acslot_ref[j], 0) for j in range(bpm)])
        slot = jnp.where(at_dc > 0, dcs, acs)
        slot_eqs = [(s, slot == s) for s in used_slots]
        sym, ln = decode_symbol(hi, slot_eqs)
        # DC: size = sym (<= 15 valid).  AC: run/size split; EOB or k past
        # 63 ends the block; invalid codes consume 17 bits as EOB (any
        # deterministic >= 1-bit rule works off the true path).
        dc_size = jnp.minimum(sym, 15)
        run = _lsr(sym, 4)
        ac_size = sym & 15
        newk = k + run + 1
        eob = sym == 0
        blk_end = jnp.logical_and(
            at_dc == 0, jnp.logical_or(eob, newk >= 63)
        )
        consume = jnp.where(at_dc > 0, ln + dc_size, ln + ac_size)
        consume = jnp.where(act, consume, 0)
        hi = _shl_safe(hi, consume) | _lsr_safe(lo, 32 - consume)
        lo = _shl_safe(lo, consume)
        navail = navail - consume
        p = p + consume
        k = jnp.where(
            jnp.logical_and(act, at_dc > 0),
            0,
            jnp.where(act, jnp.minimum(newk, 63), k),
        )
        newc = jnp.where(blk_end, c + 1, c)
        newc = jnp.where(newc == bpm, 0, newc)
        c = jnp.where(act, newc, c)
        at_dc = jnp.where(
            act, jnp.where(at_dc > 0, 0, blk_end.astype(jnp.int32)), at_dc
        )
        out = (p, c, at_dc, k, hi, lo, navail, wp)
        if record:
            out = out + (recn,) + tuple(rec)
        return out

    state = (p, c, at_dc, k, hi, lo, navail, wp)
    if record:
        zero = jnp.zeros(SEG_SHAPE, jnp.int32)
        state = state + (zero,) + (zero,) * maxrec
    max_iters = sb_bits + 2

    if unroll:
        # Chunked while: _CHUNK branch-free iterations per any-active
        # scalar sync.  Every active iteration consumes >= 1 bit, so the
        # loop terminates; the counter bounds it anyway (a wedged Pallas
        # program takes the device down for the whole process).
        def cond(carry):
            it = carry[0]
            p = carry[1]
            return jnp.logical_and(it < max_iters, jnp.max(jnp.where(p < end, 1, 0)) > 0)

        def body(carry):
            it = carry[0]
            st = carry[1:]
            for _ in range(_CHUNK):
                st = step(st)
            return (it + _CHUNK,) + st

        carry = jax.lax.while_loop(cond, body, (jnp.int32(0),) + state)
        state = carry[1:]
    else:
        # Interpret path (CPU tests): bounded fori of masked no-ops.
        state = jax.lax.fori_loop(
            0, max_iters, lambda _, s: step(s), state
        )

    exit_ref[0, 0] = state[0]
    exit_ref[0, 1] = state[1]
    exit_ref[0, 2] = state[2]
    exit_ref[0, 3] = state[3]
    if record:
        rec_ref, recn_ref = rec_refs
        recn_ref[0, 0] = state[8]
        for j in range(maxrec):
            rec_ref[0, j] = state[9 + j]


def _scan_round(
    windows: jax.Array,   # (BS, NWS, 8, 128) i32
    entry: jax.Array,     # (BS, 4, 8, 128) i32
    nbits: jax.Array,     # (1,) i32
    dcslot: jax.Array,    # (bpm,) i32
    acslot: jax.Array,    # (bpm,) i32
    cbase: jax.Array,     # (8, 16) i32
    counts: jax.Array,    # (8, 17) i32
    symbols: jax.Array,   # (8, 8, 128) i32
    *,
    used_slots: Tuple[int, ...],
    bpm: int,
    sb: int,
    maxrec: int,
    record: bool,
    interpret: bool,
):
    bs, nws = windows.shape[0], windows.shape[1]
    out_shape = [jax.ShapeDtypeStruct((bs, 4, SUBLANES, LANES), jnp.int32)]
    out_specs = [
        pl.BlockSpec(
            (1, 4, SUBLANES, LANES), lambda b, *_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    if record:
        out_shape += [
            jax.ShapeDtypeStruct((bs, maxrec, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((bs, 1, SUBLANES, LANES), jnp.int32),
        ]
        out_specs += [
            pl.BlockSpec(
                (1, maxrec, SUBLANES, LANES), lambda b, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, SUBLANES, LANES), lambda b, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(bs,),
        in_specs=[
            pl.BlockSpec(
                (1, nws, SUBLANES, LANES), lambda b, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, SUBLANES, LANES), lambda b, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    return pl.pallas_call(
        functools.partial(
            _scan_kernel, record, tuple(used_slots), bpm, sb, maxrec,
            not interpret,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(nbits, dcslot, acslot, cbase, counts, windows, entry, symbols)


def device_index_scan(
    windows: jax.Array,    # (BS, NWS, 8, 128) i32 per-lane word windows
    nbits: jax.Array,      # (1,) i32 real stream bits
    dcslot: jax.Array,     # (bpm,) i32
    acslot: jax.Array,     # (bpm,) i32
    cbase: jax.Array,      # (8, 16) i32
    counts: jax.Array,     # (8, 17) i32
    symbols: jax.Array,    # (8, 8, 128) i32
    *,
    used_slots: Tuple[int, ...],
    bpm: int,
    sb: int,
    maxrec: int,
    n_mcus: int,
    max_rounds: int = 16,
    interpret: bool = False,
):
    """Parallel index scan: converged per-MCU bit offsets, on device.

    Returns (bitpos, ok, stats):
      bitpos (n_mcus,) i32 -- destuffed-stream bit offset of each MCU
        (garbage unless ok);
      ok () bool -- converged AND no record overflow AND at least n_mcus
        records (the caller falls back to the serial scan when False);
      stats (3,) i32 -- (rounds, total_records, overflowed) for artifacts.

    Pure function of device arrays + static config: safe to call inside a
    larger jit (the serving path fuses it with the restart decode and the
    pixel pipeline into one program).
    """
    bs = windows.shape[0]
    sb_bits = sb * 8

    # Lanes at or past the stream end never decode; pin their entries to
    # the start state so the shift chain doesn't ripple the tail lane's
    # exit through up to 1023 padding lanes (one per round), which would
    # stall the convergence check without changing any real state.
    n_slots = bs * SLOTS_PER_BATCH
    live = (
        jnp.arange(n_slots, dtype=jnp.int32) * sb_bits < nbits[0]
    )[None, :]
    pin_col = jnp.array([0, 0, 1, 0], jnp.int32)[:, None]

    def pin_and_shift(exit_state):
        # Normalize dead k at DC boundaries (prototype's fixed-point
        # normalization), shift by one lane in global (b, s, l) order,
        # re-base p to the next lane's window, and pin lane 0.
        p, c, at_dc, k = (exit_state[:, i] for i in range(4))
        k = jnp.where(at_dc > 0, 0, k)
        p = p - sb_bits
        flat = jnp.stack(
            [x.reshape(n_slots) for x in (p, c, at_dc, k)]
        )  # (4, S)
        shifted = jnp.concatenate([pin_col, flat[:, :-1]], axis=1)
        shifted = jnp.where(live, shifted, pin_col)
        return (
            shifted.reshape(4, bs, SUBLANES, LANES)
            .transpose(1, 0, 2, 3)
        )

    entry0 = jnp.zeros((bs, 4, SUBLANES, LANES), jnp.int32)
    entry0 = entry0.at[:, 2].set(1)

    def round_body(carry):
        entry, _, rounds = carry
        exit_state = _scan_round(
            windows, entry, nbits, dcslot, acslot, cbase, counts, symbols,
            used_slots=used_slots, bpm=bpm, sb=sb, maxrec=maxrec,
            record=False, interpret=interpret,
        )[0]
        new_entry = pin_and_shift(exit_state)
        changed = jnp.any(new_entry != entry)
        return new_entry, changed, rounds + 1

    def round_cond(carry):
        _, changed, rounds = carry
        return jnp.logical_and(changed, rounds < max_rounds)

    entry, changed, rounds = jax.lax.while_loop(
        round_cond, round_body, (entry0, jnp.bool_(True), jnp.int32(0))
    )
    converged = jnp.logical_not(changed)

    # Enumerate pass: record MCU starts from the converged entries.
    _, rec, recn = _scan_round(
        windows, entry, nbits, dcslot, acslot, cbase, counts, symbols,
        used_slots=used_slots, bpm=bpm, sb=sb, maxrec=maxrec,
        record=True, interpret=interpret,
    )

    # Stitch: exclusive cumsum of per-lane record counts -> global MCU
    # index of each record; one scatter materializes bitpos.
    recn_flat = recn.reshape(bs * SLOTS_PER_BATCH)
    first = jnp.cumsum(recn_flat) - recn_flat                  # (S,)
    total = first[-1] + recn_flat[-1]
    overflow = jnp.any(recn_flat > maxrec)
    lane_base = (
        jnp.arange(bs * SLOTS_PER_BATCH, dtype=jnp.int32) * sb_bits
    ).reshape(bs, 1, SUBLANES, LANES)
    j_iota = jnp.arange(maxrec, dtype=jnp.int32)[None, :, None, None]
    gidx = first.reshape(bs, 1, SUBLANES, LANES) + j_iota      # (BS,maxrec,8,128)
    valid = j_iota < recn.reshape(bs, 1, SUBLANES, LANES)
    gidx = jnp.where(valid, jnp.minimum(gidx, n_mcus), n_mcus)  # dump slot
    abs_pos = rec + lane_base
    bitpos = (
        jnp.zeros(n_mcus + 1, jnp.int32)
        .at[gidx.reshape(-1)]
        .set(abs_pos.reshape(-1))[:n_mcus]
    )
    ok = jnp.logical_and(
        jnp.logical_and(converged, jnp.logical_not(overflow)),
        total >= n_mcus,
    )
    stats = jnp.stack([rounds, total, overflow.astype(jnp.int32)])
    return bitpos, ok, stats


def gather_entropy_streams(
    windows: jax.Array,   # (BS, NWS, 8, 128) i32
    bitpos: jax.Array,    # (n_mcus,) i32
    *,
    nw: int,
    spw: int,             # non-overlapping words per window row (SB // 4)
    nws: int,             # words per window row (spw + overlap)
) -> jax.Array:
    """Bit-aligned per-MCU streams for the restart decoder, built on device.

    One XLA gather pulls each pseudo segment's ``nw + 1`` words out of the
    uploaded window tensor starting at ``bitpos >> 5`` (the window rows'
    first ``spw`` words tile the destuffed stream exactly, so flat word W
    lives at [W // spw, W % spw] in lane layout), then a per-lane variable
    shift aligns bit ``bitpos & 31`` to bit 0 -- the device equivalent of
    the host's xjpeg_pack_streams_bits.  Returns (B2, nw, 8, 128) i32,
    B2 = ceil(n_mcus / 1024); padding lanes replay segment 0 (their
    decodes are sliced off by assembly).
    """
    bs = windows.shape[0]
    n_mcus = bitpos.shape[0]
    b2 = -(-n_mcus // SLOTS_PER_BATCH)
    pad = b2 * SLOTS_PER_BATCH - n_mcus
    seg = jnp.pad(bitpos, (0, pad))
    sh = (seg & 31).reshape(b2, 1, SUBLANES, LANES)
    w0 = _lsr(seg, 5)
    w_iota = jnp.arange(nw + 1, dtype=jnp.int32)[None, :]
    word = jnp.minimum(
        w0[:, None] + w_iota, bs * SLOTS_PER_BATCH * spw - 1
    )  # (S2, nw+1) flat word index into the destuffed stream
    g = word // spw
    w_in = word - g * spw
    flat_idx = ((g // SLOTS_PER_BATCH) * nws + w_in) * SLOTS_PER_BATCH + (
        g % SLOTS_PER_BATCH
    )
    rows = jnp.take(windows.reshape(-1), flat_idx.reshape(-1), axis=0)
    rows = rows.reshape(b2, SUBLANES, LANES, nw + 1)
    rows = jnp.moveaxis(rows, -1, 1)  # (b2, nw+1, 8, 128)
    aligned = jnp.left_shift(rows[:, :nw], sh) | _lsr_safe(
        rows[:, 1:], 32 - sh
    )
    return aligned


def dc_base_from_coefs(
    kernel_out: jax.Array,     # (B2, T, 64, 8, 128) i16 restart-decoder output
    t_last: Tuple[int, ...],   # last block step of each scan component
) -> jax.Array:
    """Per-pseudo-segment DC predictor bases from the decode itself.

    With one MCU per pseudo segment the kernel accumulates DC diffs from
    0 within each segment, so component c's LAST block step carries the
    segment's total DC diff; the predictor entering segment m is the
    exclusive prefix sum over segment order -- exactly what the serial
    index scan records, with zero extra decode work.  Returns
    (B2, 8, 128, C) i32 for entropy_device.apply_dc_base.
    """
    b2 = kernel_out.shape[0]
    cols = []
    for t in t_last:
        tot = kernel_out[:, t, 0].astype(jnp.int32)       # (B2, 8, 128)
        flat = tot.reshape(b2 * SLOTS_PER_BATCH)
        base = jnp.cumsum(flat) - flat                    # exclusive
        cols.append(base.reshape(b2, SUBLANES, LANES))
    return jnp.stack(cols, axis=-1)
