"""Pallas TPU kernel: merge two SORTED streams (k-way merge building
block — reference: MergeUnionAll's heap merge, merge_union_all.cc:127,
and the external sort's final Merge, sort.cc:366-392).

A merge today runs as a full ``lax.sort`` of the concatenation —
O(log^2 n) bitonic stages (~120 for 32k tiles).  But merging two sorted
runs needs only ONE bitonic MERGE phase: log2(T) halving stages.  Per
output tile, the contributing input ranges are found with merge-path
diagonal binary searches (tiny, done outside the kernel); in-kernel the
A-run ascends at the tile front, the B-run is placed REVERSED behind it
(their lengths sum to exactly the tile size on interior tiles), forming
a bitonic sequence that 15 XOR-butterfly min/max stages sort — each
stage two rolls + compare/selects per operand, all VMEM vector work.

Ties across streams order by (key, side, position) — the deterministic
merge order (A before B on equal keys), matching the reference's
determinism contract (merge_union_all.cc:37-39).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compaction import (LANES, _lane_iota, _roll_lanes_right, _roll_rows,
                         _row_iota, _round_up)

SUBLANES = 256
TILE = SUBLANES * LANES
MAX_ARRAYS = 8  # key ops + payload lanes per side

I32_MAX = (1 << 31) - 1


def _flat_partner(x, k):
    """values at flat position p ^ k of the (S, L) array, where flat
    p = 128*row + lane; k a power of two."""
    if k < LANES:
        # lane-level butterfly: partner = lane ^ k
        lane = _lane_iota(x.shape)
        lo = _roll_lanes_right(x, LANES - k)   # x[lane + k]
        hi = _roll_lanes_right(x, k)           # x[lane - k]
        return jnp.where((lane & k) == 0, lo, hi)
    r = k // LANES
    rows = _row_iota(x.shape)
    down = _roll_rows(x, -r)                   # x[row + r]
    up = _roll_rows(x, r)                      # x[row - r]
    return jnp.where((rows & r) == 0, down, up)


def _flip_flat(x):
    """reverse the flattened (S, L) array: flat p -> T-1-p.  Mosaic has
    no `rev`: lanes flip via a per-row gather, rows via log2(S)
    unconditional XOR-butterfly exchanges (sublane rolls + selects)."""
    S = x.shape[0]
    lane = _lane_iota(x.shape)
    rows = _row_iota(x.shape)
    gidx = jnp.broadcast_to((LANES - 1) - lane[0:1], x.shape)
    y = jnp.take_along_axis(x, gidx, axis=1)
    r = 1
    while r < S:
        down = _roll_rows(y, -r)   # y[row + r]
        up = _roll_rows(y, r)      # y[row - r]
        y = jnp.where((rows & r) == 0, down, up)
        r *= 2
    return y


def _bitonic_merge(keys, pays):
    """sort a bitonic (asc-then-desc) flat sequence ascending by the
    lexicographic key tuple; payloads move along."""
    S = keys[0].shape[0]
    n = S * LANES
    lane = _lane_iota((S, LANES))
    rows = _row_iota((S, LANES))
    flat = rows * LANES + lane
    k = n // 2
    while k >= 1:
        pk = [_flat_partner(x, k) for x in keys]
        pp = [_flat_partner(x, k) for x in pays]
        upper = (flat & k) != 0
        # lexicographic self > partner
        gt = jnp.zeros(keys[0].shape, jnp.bool_)
        eq = jnp.ones(keys[0].shape, jnp.bool_)
        for x, px in zip(keys, pk):
            gt = gt | (eq & (x > px))
            eq = eq & (x == px)
        # lower half keeps min (swap if self > partner); upper keeps max
        # (bitwise combine: jnp.where with i1 VALUE operands does not
        # lower — "unsupported target bitwidth for truncation")
        lt = ~gt & ~eq
        swap = (upper & lt) | (~upper & gt)
        keys = [jnp.where(swap, px, x) for x, px in zip(keys, pk)]
        pays = [jnp.where(swap, px, x) for x, px in zip(pays, pp)]
        k //= 2
    return keys, pays


def _kernel(iA_ref, jB_ref, *refs, n_keys: int, n_pays: int):
    """iA_ref/jB_ref: int32[nt+1] — elements of each side consumed
    before tile t."""
    S = SUBLANES
    t = pl.program_id(0)
    na = n_keys + n_pays  # arrays per side
    i = 0
    aA = refs[i:i + na]; i += na          # A block at iA[t]//T
    aA2 = refs[i:i + na]; i += na         # next A block
    bA = refs[i:i + na]; i += na          # B block
    bA2 = refs[i:i + na]; i += na
    out_refs = refs[i:i + na]; i += na
    stage = refs[i:i + 2 * na]            # (2S, L) scratch per array

    lane = _lane_iota((S, LANES))
    rows = _row_iota((S, LANES))
    flat = rows * LANES + lane

    iA0 = iA_ref[t]
    iA1 = iA_ref[t + 1]
    jB0 = jB_ref[t]
    jB1 = jB_ref[t + 1]
    ka = iA1 - iA0
    kb = jB1 - jB0

    def aligned(blk_ref, blk2_ref, st_ref, off, fill):
        """window element [off + p] for p in [0, T), from two stacked
        blocks; positions beyond the source fill with ``fill``."""
        st_ref[0:S, :] = blk_ref[:]
        st_ref[S:2 * S, :] = blk2_ref[:]
        o = off % TILE
        r0 = o // LANES
        a0 = o % LANES
        gidx = jnp.broadcast_to((lane[0:1] + a0) % LANES, (S + 1, LANES))
        blk = st_ref[pl.ds(r0, S + 1), :]
        xg = jnp.take_along_axis(blk, gidx, axis=1)
        return jnp.where(lane + a0 < LANES, xg[0:S], xg[1:S + 1])

    # A ascending at the tile front
    a_arrs = [aligned(aA[j], aA2[j], stage[j], iA0, 0) for j in range(na)]
    # B ascending, then flipped and placed so element u of the B window
    # lands at flat position T-1-u (descending tail)
    b_arrs = [aligned(bA[j], bA2[j], stage[na + j], jB0, 0)
              for j in range(na)]
    b_flip = [_flip_flat(x) for x in b_arrs]
    # after the double flip, B window element u sits at flat T-1-u
    in_a = flat < ka
    in_b = flat >= TILE - kb
    keys = []
    pays = []
    for j in range(na):
        merged = jnp.where(in_a, a_arrs[j], b_flip[j])
        if j < n_keys:
            keys.append(jnp.where(in_a | in_b, merged,
                                  jnp.full_like(merged, I32_MAX)))
        else:
            pays.append(merged)
    # tiebreak lane, SIDE-major: all A rows precede all B rows on equal
    # keys (matching the merge-path's A-first rule), positions within a
    # side stay ordered — the (key, side, position) total order
    tb_a = iA0 + flat
    tb_b = (jB0 + (TILE - 1 - flat)) + (1 << 30)
    tb = jnp.where(in_a, tb_a, jnp.where(in_b, tb_b, I32_MAX))
    keys = keys + [tb.astype(jnp.int32)]
    keys, pays = _bitonic_merge(keys, pays)
    for j in range(n_keys):
        out_refs[j][:] = keys[j]
    for j in range(n_pays):
        out_refs[n_keys + j][:] = pays[j]


def merge_path_splits(a_key_ops, b_key_ops, nt: int):
    """iA[t], jB[t] per output tile: the merge-path diagonal splits,
    comparing full lexicographic key tuples with A-first tie order —
    equal-key runs therefore emit all their A elements before their B
    elements, so the global order is exactly (keys, side, position)
    even when a run spans tile boundaries."""
    import math

    na = a_key_ops[0].shape[0]
    nb = b_key_ops[0].shape[0]
    pos = jnp.minimum(jnp.arange(nt + 1, dtype=jnp.int32) * TILE, na + nb)
    lo = jnp.maximum(0, pos - nb)
    hi = jnp.minimum(pos, na)
    steps = int(math.ceil(math.log2(max(na + nb, 2)))) + 1
    for _ in range(steps):
        mid = (lo + hi) // 2
        bj = pos - mid - 1
        # a[mid] <= b[pos-mid-1] lexicographically -> consume more A
        le = jnp.ones(pos.shape, jnp.bool_)
        eq = jnp.ones(pos.shape, jnp.bool_)
        lt = jnp.zeros(pos.shape, jnp.bool_)
        for a_op, b_op in zip(a_key_ops, b_key_ops):
            a_mid = a_op[jnp.clip(mid, 0, max(na - 1, 0))]
            b_at = b_op[jnp.clip(bj, 0, max(nb - 1, 0))]
            lt = lt | (eq & (a_mid < b_at))
            eq = eq & (a_mid == b_at)
        le = lt | eq
        go_right = (mid < hi) & le
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    iA = lo
    jB = pos - lo
    return iA.astype(jnp.int32), jB.astype(jnp.int32)


def merge_sorted(a_keys, a_pays, b_keys, b_pays, out_cap: int):
    """Merge two sorted streams.  ``*_keys``: monotone int32 key code
    operands (first operand drives the merge-path; remaining operands +
    the implicit (side, position) tiebreak order equal keys inside the
    bitonic stage).  ``*_pays``: 4-byte payload arrays.  Returns
    (merged_keys, merged_pays) at ``out_cap`` (tail beyond the total
    filled with I32_MAX keys / garbage payloads)."""
    n_keys = len(a_keys)
    n_pays = len(a_pays)
    assert n_keys >= 1 and len(b_keys) == n_keys and len(b_pays) == n_pays
    na_tot = a_keys[0].shape[0]
    nb_tot = b_keys[0].shape[0]
    out_pad = _round_up(max(out_cap, 1), TILE)
    nt = out_pad // TILE

    iA, jB = merge_path_splits(a_keys, b_keys, nt)

    def prep(arrs, n):
        pad = _round_up(max(n, 1), TILE) + TILE - n
        outs = []
        for x in arrs:
            assert jnp.dtype(x.dtype).itemsize == 4, x.dtype
            fill = jnp.zeros(pad, x.dtype)
            outs.append(jnp.concatenate([x, fill])
                        .reshape(-1, LANES))
        return outs

    a2 = prep(list(a_keys) + list(a_pays), na_tot)
    b2 = prep(list(b_keys) + list(b_pays), nb_tot)
    na = n_keys + n_pays

    # number of (SUBLANES, LANES) blocks per padded side; the "+1" specs
    # clamp so a fully-consumed side at an exact TILE multiple
    # (iA0 == na) cannot address one block past the input (correctness
    # previously leaned on Pallas dynamic-slice clamping + in_a/in_b
    # masking rather than in-bounds indexing)
    nblk_a = (_round_up(max(na_tot, 1), TILE) + TILE) // TILE
    nblk_b = (_round_up(max(nb_tot, 1), TILE) + TILE) // TILE
    spec_a0 = pl.BlockSpec((SUBLANES, LANES),
                           lambda i, iA, jB: (iA[i] // TILE, 0),
                           memory_space=pltpu.VMEM)
    spec_a1 = pl.BlockSpec(
        (SUBLANES, LANES),
        lambda i, iA, jB: (jnp.minimum(iA[i] // TILE + 1, nblk_a - 1), 0),
        memory_space=pltpu.VMEM)
    spec_b0 = pl.BlockSpec((SUBLANES, LANES),
                           lambda i, iA, jB: (jB[i] // TILE, 0),
                           memory_space=pltpu.VMEM)
    spec_b1 = pl.BlockSpec(
        (SUBLANES, LANES),
        lambda i, iA, jB: (jnp.minimum(jB[i] // TILE + 1, nblk_b - 1), 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((SUBLANES, LANES), lambda i, iA, jB: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[spec_a0] * na + [spec_a1] * na
        + [spec_b0] * na + [spec_b1] * na,
        out_specs=[out_spec] * na,
        scratch_shapes=[pltpu.VMEM((2 * SUBLANES, LANES), x.dtype)
                        for x in a2] * 2,
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, n_keys=n_keys, n_pays=n_pays),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((out_pad // LANES, LANES),
                                            x.dtype) for x in a2],
            interpret=jax.default_backend() == "cpu",
        )(iA, jB, *a2, *a2, *b2, *b2)
    flat = [o.reshape(out_pad)[:out_cap] for o in outs]
    return flat[:n_keys], flat[n_keys:]
