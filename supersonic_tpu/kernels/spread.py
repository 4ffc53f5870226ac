"""Pallas TPU kernel: monotone run expansion ("spread") — the inverse of
kernels/compaction.py.

Given dense source rows and strictly-increasing output start offsets
``base`` (every source covers >= 1 output row), produce
``out[j] = src[i]`` for ``j in [base[i], base[i+1])`` — the expansion
step of NOT_UNIQUE / multi-match hash joins (reference: the per-query
match-list walk of HashJoin's ResultCursor, hash_join.cc:759-791).

XLA expresses this as an 8M..64M-index gather (element-serial, ~6 ns per
index: the dominant cost of the CSR join path).  This kernel instead
streams output tiles: the sources feeding a tile are a consecutive run
(scalar-prefetched bounds), moved to their in-tile positions by the
mirror of the compaction kernel — a top-down group SPLIT (flat shift
right by 128k - n1, one lane-roll + bounded sublane candidates), an
inverse within-row shift-doubling, then log-pass forward fills and a
cross-tile carry.  Output tiles are written with plain blocked specs
(the expansion is tile-aligned by construction).  All passes are VMEM
vector work; no per-index HBM access.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compaction import (LANES, _lane_iota, _roll_lanes_right, _roll_rows,
                         _row_iota, _round_up, _seg_bcast_start)

SUBLANES = 256
TILE = SUBLANES * LANES
SEQ_MIN_K = 16                 # smallest group height split sequentially
MAX_PAYLOADS = 8
P_SENTINEL = TILE              # target for dead window elements


def _prefix_excl_lane256(v2):
    """(2, LANES) lane-layout values -> exclusive prefix sum over the
    256 flattened entries, same layout."""
    lane = _lane_iota((2, LANES))
    x = v2
    s = 1
    while s < LANES:
        x = x + jnp.where(lane >= s, _roll_lanes_right(x, s), 0)
        s *= 2
    row0_total = jnp.broadcast_to(x[0:1, LANES - 1:LANES], (1, LANES))
    incl = x + jnp.concatenate(
        [jnp.zeros((1, LANES), x.dtype), row0_total], axis=0)
    return incl - v2


def _lane256_to_col(v2):
    """(2, LANES) lane layout -> (256, LANES) sublane layout with the
    value broadcast across lanes (transpose + full-width broadcasts;
    Mosaic rejects 1-lane concatenates and lane-vector reshapes)."""
    t = v2.T  # (LANES, 2)
    lo = jnp.broadcast_to(t[:, 0:1], (LANES, LANES))
    hi = jnp.broadcast_to(t[:, 1:2], (LANES, LANES))
    return jnp.concatenate([lo, hi], axis=0)


def _split_level_vec(arrays, a_col, k):
    """data-parallel top-down split at group height k for all groups."""
    S = arrays[0].shape[0]
    h = 2 * k
    lane = _lane_iota((S, LANES))
    rows = _row_iota((S, LANES))
    t = rows % h
    a_bcast = jnp.broadcast_to(a_col, (S, LANES))
    a_gs = _seg_bcast_start(a_bcast, h)
    a_mid = _seg_bcast_start(_roll_rows(a_bcast, -k), h)  # A[gs+k]
    n1 = a_mid - a_gs
    D = LANES * k - n1
    q = D // LANES
    rem = D - LANES * q
    outs = []
    for x in arrays:
        gidx = (lane - rem) % LANES
        xg = jnp.take_along_axis(x, gidx, axis=1)
        up1 = jnp.zeros_like(x)
        up2 = jnp.zeros_like(x)
        for d in range(0, k + 1):
            src = _roll_rows(xg, d)          # xg[r-d]
            up1 = jnp.where(q == d, src, up1)
            if d + 1 <= k:
                up2 = jnp.where(q == d, _roll_rows(xg, d + 1), up2)
        moved = jnp.where(lane >= rem, up1, up2)
        outs.append(jnp.where(t < k, x, moved))
    return outs


def _split_level_seq(refs, a_ref, k, num_groups):
    """sequential top-down split at group height k over scratch refs.
    a_ref rows hold A[r] (exclusive source count) broadcast per lane."""

    def body(g, _):
        gs = g * 2 * k
        a0 = a_ref[gs, 0]
        n1 = a_ref[gs + k, 0] - a0
        D = LANES * k - n1

        @pl.when(D > 0)
        def _():
            rb = n1 // LANES
            q = D // LANES
            rem = D - LANES * q
            # From n1 + D = 128k: (k - q - rb) is 0 when rem == 0, else 1.
            lane_k1 = _lane_iota((k + 1, LANES))
            lane_k = _lane_iota((k, LANES))
            gidx = (lane_k1 - rem) % LANES
            for r in refs:
                blk = r[pl.ds(gs + rb, k + 1), :]
                xg = jnp.take_along_axis(blk, gidx, axis=1)
                zero = jnp.zeros((1, LANES), xg.dtype)
                up1 = jax.lax.cond(rem == 0,
                                   lambda: xg[0:k, :],
                                   lambda: xg[1:k + 1, :])
                up2 = jax.lax.cond(
                    rem == 0,
                    lambda: jnp.concatenate([zero, xg[0:k - 1, :]], axis=0),
                    lambda: xg[0:k, :])
                moved = jnp.where(lane_k >= rem, up1, up2)
                r[pl.ds(gs + k, k), :] = moved
        return 0

    jax.lax.fori_loop(0, num_groups, body, 0)


def _kernel(los_ref, *refs, n_payloads: int, seq_min_k: int):
    S = SUBLANES
    t = pl.program_id(0)
    np_ = n_payloads
    i = 0
    winA = refs[i:i + np_]; i += np_
    winB = refs[i:i + np_]; i += np_
    baseA = refs[i]; i += 1
    baseB = refs[i]; i += 1
    out_refs = refs[i:i + np_]; i += np_
    wscratch = refs[i:i + np_]; i += np_        # (2S, L) window copies
    pscratch = refs[i]; i += 1                  # (2S, L) base window
    sscratch = refs[i:i + np_]; i += np_        # (S, L) split payloads
    p_ref = refs[i]; i += 1                     # (S, L) split p values
    a_ref = refs[i]; i += 1                     # (S, L) A values
    carry = refs[i:i + np_]; i += np_           # (1, L) per payload

    @pl.when(t == 0)
    def _():
        for j in range(np_):
            carry[j][:] = jnp.zeros((1, LANES), carry[j].dtype)

    lo = los_ref[t]
    hi = los_ref[t + 1]
    kcnt = hi - lo
    off0 = lo % TILE
    r0 = off0 // LANES
    a0 = off0 % LANES
    lane = _lane_iota((S, LANES))
    rows = _row_iota((S, LANES))

    # ---- stage windows, align the dense run to offset 0 ----
    for j in range(np_):
        wscratch[j][0:S, :] = winA[j][:]
        wscratch[j][S:2 * S, :] = winB[j][:]
    pscratch[0:S, :] = baseA[:]
    pscratch[S:2 * S, :] = baseB[:]

    gidx0 = jnp.broadcast_to(((lane[0:1] + a0) % LANES), (S + 1, LANES))

    def aligned(src_ref):
        blk = src_ref[pl.ds(r0, S + 1), :]
        xg = jnp.take_along_axis(blk, gidx0, axis=1)
        return jnp.where(lane + a0 < LANES, xg[0:S], xg[1:S + 1])

    dense = [aligned(wscratch[j]) for j in range(np_)]
    base_d = aligned(pscratch)
    alive0 = (rows * LANES + lane) < kcnt
    p = jnp.where(alive0, base_d - t * TILE, P_SENTINEL).astype(jnp.int32)

    # ---- per-output-row source counts -> exclusive A (sublane layout) --
    tgt = jnp.where(alive0, p // LANES, S)
    counts = []
    for kr in range(2):
        bins = _lane_iota((1, LANES)) + kr * LANES
        match = tgt[:, :, None] == bins[None, :, :]
        counts.append(jnp.sum(match, axis=(0, 1), dtype=jnp.int32))
    c2 = jnp.stack(counts, axis=0)
    a_col = _lane256_to_col(_prefix_excl_lane256(c2))  # (S, 1)

    # ---- top-down splits: sequential big k, vectorized small k ----
    arrays = dense + [p]
    k = S // 2
    if k >= seq_min_k:
        for r, x in zip(list(sscratch) + [p_ref], arrays):
            r[:] = x
        a_ref[:] = jnp.broadcast_to(a_col, (S, LANES))
        while k >= seq_min_k:
            _split_level_seq(list(sscratch) + [p_ref], a_ref, k,
                             S // (2 * k))
            k //= 2
        arrays = [r[:] for r in sscratch] + [p_ref[:]]
    while k >= 1:
        arrays = _split_level_vec(arrays, a_col, k)
        k //= 2
    dense, p = arrays[:np_], arrays[np_]

    # ---- within-row spread to target lanes (inverse shift-doubling,
    # MSB->LSB: rightward moves keep positions distinct when the HIGH
    # part of the remaining distance is applied first — the mirror of
    # the compaction kernel's LSB->MSB leftward order) ----
    alive = ((p // LANES) == rows).astype(jnp.int32)
    tl = p - rows * LANES          # p % 128 for alive rows
    dist = jnp.where(alive != 0, tl - lane, 0).astype(jnp.int32)
    vals = list(dense)
    s = LANES // 2
    while s >= 1:
        inc_alive = _roll_lanes_right(alive, s)
        inc_dist = _roll_lanes_right(dist, s)
        take = (inc_alive != 0) & ((inc_dist & s) != 0)
        stay = (alive != 0) & ((dist & s) == 0)
        vals = [jnp.where(take, _roll_lanes_right(v, s), v) for v in vals]
        dist = jnp.where(take, inc_dist - s, dist)
        alive = (take | stay).astype(jnp.int32)
        s //= 2

    # ---- forward fill within rows ----
    placed = alive
    s = 1
    while s < LANES:
        from_left = (lane >= s) & (_roll_lanes_right(placed, s) != 0)
        use = (placed == 0) & from_left
        vals = [jnp.where(use, _roll_lanes_right(v, s), v) for v in vals]
        placed = jnp.where(use, 1, placed)
        s *= 2

    # ---- cross-row fill + tile carry (full-width arrays: Mosaic
    # rejects 1-lane concatenates) ----
    zero_row = jnp.zeros((1, LANES), jnp.int32)
    covered = jnp.broadcast_to(placed[:, LANES - 1:LANES], (S, LANES))
    prev_has = jnp.concatenate([zero_row, covered[:-1]], axis=0)
    prevs = [jnp.concatenate(
        [zero_row.astype(v.dtype),
         jnp.broadcast_to(v[:-1, LANES - 1:LANES], (S - 1, LANES))],
        axis=0) for v in vals]
    riota = _row_iota((S, LANES))
    s = 1
    while s < S:
        guard = (riota >= s) & (prev_has == 0)
        use = guard & (_roll_rows(prev_has, s) != 0)
        prevs = [jnp.where(use, _roll_rows(pv, s), pv) for pv in prevs]
        prev_has = jnp.where(use, 1, prev_has)
        s *= 2
    has_b = prev_has != 0
    placed_b = placed != 0
    for j in range(np_):
        cj = jnp.broadcast_to(carry[j][0:1, 0:1], (S, LANES))
        fill = jnp.where(has_b, prevs[j], cj)
        final = jnp.where(placed_b, vals[j], fill)
        out_refs[j][:] = final
        carry[j][:] = jnp.broadcast_to(
            final[S - 1:S, LANES - 1:LANES], (1, LANES))


def spread_many(payloads, base, out_cap: int):
    """``spread_kernel`` for any number of payload lanes: chunks into
    kernel calls sharing the same ``base``.  Each call redoes the split
    bookkeeping (p/A computation), so wide lane sets pay ~40% per extra
    call — still bandwidth-class vs. the per-index gather it replaces.
    Chunk size 6 (< MAX_PAYLOADS): measured on v5e, an 8-payload call
    needs 16.27 MB of scoped VMEM against the 16 MB limit (~1.94 MB per
    payload + ~0.8 MB fixed); 6 stays at ~12.4 MB."""
    CHUNK = 6
    outs = []
    for i in range(0, len(payloads), CHUNK):
        outs.extend(spread_kernel(payloads[i:i + CHUNK], base, out_cap))
    return outs


def spread_kernel(payloads, base, out_cap: int):
    """Expand dense ``payloads`` (one row per source) to ``out_cap``
    rows: out[j] = payloads[i][...] for the source i covering j.

    ``base``: int32, strictly increasing output start offsets with
    base[0] == 0 (pre-compact zero-width sources away).  Rows at/after
    the total width hold the last source's values (callers bound
    validity with a row count).  Payloads must be 4-byte dtypes."""
    n_src = base.shape[0]
    n_pay = len(payloads)
    assert 1 <= n_pay <= MAX_PAYLOADS
    out_pad = _round_up(max(out_cap, 1), TILE)
    nt = out_pad // TILE
    src_pad = _round_up(max(n_src, 1), TILE) + TILE  # + spare block B
    pads = src_pad - n_src
    base32 = base.astype(jnp.int32)
    bp = jnp.concatenate(
        [base32, jnp.full(pads, jnp.int32(2**31 - 1), jnp.int32)])
    ins = []
    for p in payloads:
        assert jnp.dtype(p.dtype).itemsize == 4, p.dtype
        ins.append(jnp.concatenate([p, jnp.zeros(pads, p.dtype)])
                   .reshape(src_pad // LANES, LANES))
    bp2 = bp.reshape(src_pad // LANES, LANES)
    tile_starts = jnp.arange(nt + 1, dtype=jnp.int32) * TILE
    los = jnp.minimum(
        jnp.searchsorted(base32, tile_starts, side="left"),
        n_src).astype(jnp.int32)

    win_a = pl.BlockSpec((SUBLANES, LANES),
                         lambda i, los: (los[i] // TILE, 0),
                         memory_space=pltpu.VMEM)
    win_b = pl.BlockSpec((SUBLANES, LANES),
                         lambda i, los: (los[i] // TILE + 1, 0),
                         memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((SUBLANES, LANES), lambda i, los: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[win_a] * n_pay + [win_b] * n_pay + [win_a, win_b],
        out_specs=[out_spec] * n_pay,
        scratch_shapes=(
            [pltpu.VMEM((2 * SUBLANES, LANES), p.dtype) for p in payloads]
            + [pltpu.VMEM((2 * SUBLANES, LANES), jnp.int32)]
            + [pltpu.VMEM((SUBLANES, LANES), p.dtype) for p in payloads]
            + [pltpu.VMEM((SUBLANES, LANES), jnp.int32)]
            + [pltpu.VMEM((SUBLANES, LANES), jnp.int32)]
            + [pltpu.VMEM((1, LANES), p.dtype) for p in payloads]
        ),
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, n_payloads=n_pay,
                              seq_min_k=SEQ_MIN_K),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((out_pad // LANES, LANES),
                                            p.dtype) for p in payloads],
            interpret=jax.default_backend() == "cpu",
        )(los, *ins, *ins, bp2, bp2)
    return [o.reshape(out_pad)[:out_cap] for o in outs]
