"""Pallas TPU kernel: single-pass stable stream compaction.

The filter/compaction hot path (reference: PrepareInputRowIds + the
SelectiveViewCopier gather, cursor/core/filter.cc:169-230).  XLA offers
no parallel compaction primitive — the engine's previous scheme ran
batched per-tile bitonic SORTS on a 1-bit key (~120 compare stages for
32k-row tiles, ~8.3 ms / 8M rows on v5e).  This kernel compacts each
tile in O(log) data passes instead:

  Phase A — within-row (128-lane) compaction: LSB->MSB shift-doubling
     of (source-lane, remaining-distance, alive) — 7 roll+select steps;
     collision-free because survivor distances are non-decreasing along
     the row.  Payloads then move with ONE per-row ``dynamic_gather``
     (take_along_axis along lanes, the same Mosaic op lut_gather uses).
  Phase B — hierarchical pair-merge of row groups (k = 1, 2, 4, ...):
     a group's second half shifts left by a flat amount D = 128k - n1,
     realized as one per-row lane-roll (gather) plus a bounded
     candidate-select over the sublane delta d = k - rb in [0, k].
     Small-k levels run data-parallel across all pairs; large-k levels
     (few pairs) run as a sequential loop with dynamic row slices.
  Phase C — global stitch: the dense tile is lane-rotated by the
     running output offset (scalar-prefetched), merged with a carry row
     held in VMEM across the sequential grid, and DMA'd to HBM as
     complete 128-lane rows at the tile's row offset.  No overlapping
     writes, no host round trip, no extra XLA stitch pass.

Supports any 4-byte payloads (i64/f64 ride as two u32 lanes, split by
the caller).  Falls back to interpret mode on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 256                  # rows per tile
TILE = SUBLANES * LANES         # 32768 elements per tile
SEQ_MIN_K = 32                  # smallest group height merged sequentially
# (swept on v5e, 8M rows x 3 payloads: k=2 5.9ms, 4 3.5, 8 2.7, 16 2.1,
#  32 2.0, 64 3.0, 256 6.7 — hybrid beats both extremes)
MAX_PAYLOADS = 12


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _roll_lanes_right(x, s):
    if s % LANES == 0:
        return x
    return pltpu.roll(x, s % LANES, axis=1)


def _roll_rows(x, s):
    """circular roll DOWN by s (s may be negative: roll up)."""
    S = x.shape[0]
    s = s % S
    if s == 0:
        return x
    return pltpu.roll(x, s, axis=0)


def _prefix_incl(m_i32):
    """inclusive prefix sum along lanes (7 masked roll-adds)."""
    x = m_i32
    lane = _lane_iota(x.shape)
    s = 1
    while s < LANES:
        x = x + jnp.where(lane >= s, _roll_lanes_right(x, s), 0)
        s *= 2
    return x


def _phase_a_grow(m):
    """within-row compaction gather indices + per-row counts.

    -> (grow (S,L) int32: grow[r,j] = source lane of the j-th survivor
        of row r (j < c[r]); c (S,L) int32 broadcast per-row count)"""
    shape = m.shape
    pincl = _prefix_incl(m.astype(jnp.int32))
    c = jnp.broadcast_to(pincl[:, LANES - 1:LANES], shape)
    lane = _lane_iota(shape)
    dist = jnp.where(m, lane - (pincl - 1), 0).astype(jnp.int32)
    idx = lane
    alive = m.astype(jnp.int32)  # i32: Mosaic can't rotate i1 vectors
    s = 1
    while s < LANES:
        # left-roll by s == circular right-roll by L-s
        inc_idx = _roll_lanes_right(idx, LANES - s)
        inc_dist = _roll_lanes_right(dist, LANES - s)
        inc_alive = _roll_lanes_right(alive, LANES - s)
        take = (inc_alive != 0) & ((inc_dist & s) != 0)
        stay = (alive != 0) & ((dist & s) == 0)
        idx = jnp.where(take, inc_idx, idx)
        dist = jnp.where(take, inc_dist - s, dist)
        alive = (take | stay).astype(jnp.int32)
        s *= 2
    return idx, c


def _seg_bcast_start(x, h):
    """broadcast each h-row group's START row value down the group."""
    r = _row_iota(x.shape)
    y = x
    s = 1
    while s < h:
        y = jnp.where(((r % h) & s) != 0, _roll_rows(y, s), y)
        s *= 2
    return y


def _merge_level_vec(payloads, cnt, k):
    """data-parallel merge of all row-group pairs at group height k.

    payloads: list of (S,L) arrays, each group of k rows dense;
    cnt: (S,L) int32, group count at each group's start row.
    Returns (payloads', cnt') at group height 2k."""
    S = payloads[0].shape[0]
    h = 2 * k
    lane = _lane_iota((S, LANES))
    rows = _row_iota((S, LANES))
    n1 = _seg_bcast_start(cnt, h)
    n2_start = _roll_rows(cnt, -k)          # cnt[r+k] (valid at start rows)
    rb_raw = n1 // LANES
    # clamp so the merge window [rb, rb+k] stays inside the group
    # (rb == k means G1 full: a becomes 128, every lane keeps/uses up2)
    rb = jnp.minimum(rb_raw, k - 1)
    a = n1 - LANES * rb
    t = rows % h
    d1 = k - rb                              # in [1, k]
    outs = []
    for x in payloads:
        gidx = (lane - a) % LANES
        xg = jnp.take_along_axis(x, gidx, axis=1)
        up1 = jnp.zeros_like(x)
        up2 = jnp.zeros_like(x)
        up2 = jnp.where(d1 == 1, xg, up2)    # d1-1 == 0 candidate
        for d in range(1, k + 1):
            src = _roll_rows(xg, -d)         # xg[r+d]
            up1 = jnp.where(d1 == d, src, up1)
            up2 = jnp.where(d1 == d + 1, src, up2)
        m_rows = jnp.where(lane >= a, up1, up2)
        out = jnp.where(t < rb, x,
                        jnp.where((t == rb) & (lane < a), x, m_rows))
        outs.append(out)
    cnt2 = jnp.where(t == 0, n1 + n2_start, cnt)
    return outs, cnt2


def _merge_level_seq(refs, cnt_ref, k, num_pairs):
    """sequential merge at group height k over scratch refs."""

    def body(p, _):
        gs = p * 2 * k
        n1 = cnt_ref[gs, 0]
        n2 = cnt_ref[gs + k, 0]
        rb_raw = n1 // LANES
        rb = jnp.minimum(rb_raw, k - 1)
        a = n1 - LANES * rb
        lane_k = _lane_iota((k, LANES))
        lane_k1 = _lane_iota((k + 1, LANES))
        gidx = (lane_k - a) % LANES
        for r in refs:
            g2 = r[pl.ds(gs + k, k), :]
            xg = jnp.take_along_axis(g2, gidx, axis=1)
            zero = jnp.zeros((1, LANES), xg.dtype)
            up1 = jnp.concatenate([xg, zero], axis=0)      # Rr[t-rb]
            up2 = jnp.concatenate([zero, xg], axis=0)      # Rr[t-rb-1]
            m_rows = jnp.where(lane_k1 >= a, up1, up2)
            exist = r[pl.ds(gs + rb, 1), :]
            m0 = jnp.where(lane_k1[0:1] < a, exist, m_rows[0:1])
            r[pl.ds(gs + rb, k + 1), :] = jnp.concatenate(
                [m0, m_rows[1:]], axis=0)
        cnt_ref[pl.ds(gs, 1), :] = jnp.full((1, LANES), n1 + n2,
                                            jnp.int32)
        return 0

    jax.lax.fori_loop(0, num_pairs, body, 0)


def _kernel(off_ref, m_ref, *refs, n_payloads: int, seq_min_k: int):
    S = SUBLANES
    t = pl.program_id(0)
    in_refs = refs[:n_payloads]
    out_refs = refs[n_payloads:2 * n_payloads]
    scratch = refs[2 * n_payloads:3 * n_payloads]
    stage = refs[3 * n_payloads:4 * n_payloads]
    carry = refs[4 * n_payloads:5 * n_payloads]
    cnt_ref = refs[5 * n_payloads]
    sems = refs[5 * n_payloads + 1]

    m = m_ref[:] != 0
    grow, cnt = _phase_a_grow(m)
    payloads = [jnp.take_along_axis(r[:], grow, axis=1) for r in in_refs]

    # phase B: vectorized small-k levels
    k = 1
    while k < min(seq_min_k, S):
        payloads, cnt = _merge_level_vec(payloads, cnt, k)
        k *= 2
    if k < S:
        for r, p in zip(scratch, payloads):
            r[:] = p
        cnt_ref[:] = cnt
        while k < S:
            _merge_level_seq(scratch, cnt_ref, k, S // (2 * k))
            k *= 2
        payloads = [r[:] for r in scratch]

    # phase C: rotate by the running offset, merge carry, emit full rows
    off = off_ref[t]
    off_next = off_ref[t + 1]
    a = off % LANES
    row0 = off // LANES
    lane1 = _lane_iota((S + 1, LANES))

    @pl.when(t == 0)
    def _():
        for c_r in carry:
            c_r[:] = jnp.zeros((1, LANES), c_r.dtype)

    u_star = off_next // LANES - row0      # carry row within the stage

    for j in range(n_payloads):
        z = payloads[j]
        gidx = (_lane_iota((S, LANES)) - a) % LANES
        zg = jnp.take_along_axis(z, gidx, axis=1)
        up1 = jnp.concatenate([zg, jnp.zeros((1, LANES), z.dtype)], axis=0)
        up2 = jnp.concatenate([jnp.zeros((1, LANES), z.dtype), zg], axis=0)
        rot = jnp.where(lane1 >= a, up1, up2)
        first = jnp.where(lane1[0:1] < a, carry[j][:], rot[0:1])
        # stage is S+8 rows: DMA sizes must be whole (8,128) sublane
        # tiles — odd row counts produce flaky transfers (measured);
        # the 7 trailing garbage rows are overwritten by later tiles
        # (tile write-tops are monotone) or lie beyond the row count.
        stage[j][0:S + 1, :] = jnp.concatenate([first, rot[1:]], axis=0)
        stage[j][S + 1:S + 8, :] = jnp.zeros((7, LANES), z.dtype)
        carry[j][:] = stage[j][pl.ds(u_star, 1), :]
        dma = pltpu.make_async_copy(
            stage[j], out_refs[j].at[pl.ds(row0, S + 8), :], sems.at[j])
        dma.start()
    for j in range(n_payloads):
        pltpu.make_async_copy(
            stage[j], out_refs[j].at[pl.ds(row0, S + 8), :], sems.at[j]
        ).wait()


def compact_many(payloads, mask, out_cap: int):
    """``compact_kernel`` for any number of payload lanes: chunks into
    MAX_PAYLOADS-sized kernel calls sharing the same ``mask``.  Returns
    just the compacted arrays (derive the count from ``mask``)."""
    outs = []
    for i in range(0, len(payloads), MAX_PAYLOADS):
        outs.extend(compact_kernel(payloads[i:i + MAX_PAYLOADS], mask,
                                   out_cap)[0])
    return outs


def compact_kernel(payloads, mask, out_cap: int):
    """Stable-compact 1-D 32-bit ``payloads`` where ``mask`` is True.

    Returns (list of compacted arrays, count).  Rows past the count are
    garbage.  All payloads must be 4-byte dtypes and share mask's length.
    """
    n = mask.shape[0]
    n_pay = len(payloads)
    assert 1 <= n_pay <= MAX_PAYLOADS
    n_pad = _round_up(max(n, 1), TILE)
    nt = n_pad // TILE
    pad = n_pad - n
    m = mask
    if pad:
        m = jnp.concatenate([m, jnp.zeros(pad, jnp.bool_)])
    m32 = m.astype(jnp.int32)
    m2 = m32.reshape(nt * SUBLANES, LANES)
    # per-tile output offsets (exclusive scan), scalar-prefetched
    tile_counts = jnp.sum(m2.reshape(nt, TILE), axis=1, dtype=jnp.int32)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(tile_counts, dtype=jnp.int32)])
    out_rows = n_pad // LANES + SUBLANES + 8
    ins = []
    for p in payloads:
        assert jnp.dtype(p.dtype).itemsize == 4, p.dtype
        pp = jnp.concatenate([p, jnp.zeros(pad, p.dtype)]) if pad else p
        ins.append(pp.reshape(nt * SUBLANES, LANES))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec((SUBLANES, LANES), lambda i, offs: (i, 0),
                               memory_space=pltpu.VMEM)] * (1 + n_pay),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_pay,
        scratch_shapes=(
            [pltpu.VMEM((SUBLANES, LANES), p.dtype) for p in payloads]
            + [pltpu.VMEM((SUBLANES + 8, LANES), p.dtype) for p in payloads]
            + [pltpu.VMEM((1, LANES), p.dtype) for p in payloads]
            + [pltpu.VMEM((SUBLANES, LANES), jnp.int32)]
            + [pltpu.SemaphoreType.DMA((n_pay,))]
        ),
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, n_payloads=n_pay,
                              seq_min_k=SEQ_MIN_K),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((out_rows, LANES), p.dtype)
                       for p in payloads],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=jax.default_backend() == "cpu",
        )(offs, m2, *ins)
    count = jnp.minimum(offs[nt].astype(jnp.int32), out_cap)
    res = [o.reshape(out_rows * LANES)[:out_cap] for o in outs]
    return res, count


def supported_dtype(dtype) -> bool:
    return jnp.dtype(dtype).itemsize == 4


def split_words(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """64-bit array -> (lo, hi) u32 words.  For INTEGER 64-bit this
    direction of ``bitcast_convert_type`` is the one the x64 rewriter
    implements (index 0 = low word).  f64 cannot ride the bitcast in
    context (the rewriter hits "not implemented" on the resulting HLO at
    scale — re-probed r4, the tiny standalone probe is misleading);
    it is carved arithmetically instead — the mirror of
    ``combine_words``'s f64 branch, with the same carve-outs: NaNs
    emit the canonical quiet-NaN pattern (sign dropped)."""
    if jnp.dtype(x.dtype) == jnp.dtype(jnp.float64):
        return _split_f64_words(x)
    w = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return w[..., 0], w[..., 1]


def _split_f64_words(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f64 -> IEEE-754 (lo, hi) u32 words by exact arithmetic: the
    unbiased exponent comes from an 11-step binary search against exact
    power-of-two constants, the 52-bit mantissa from exact
    power-of-two scaling (every step is a scale or an integer-valued
    f64 below 2^52).  -0.0, ±inf and subnormals round-trip exactly
    through ``combine_words``; NaNs canonicalize to 0x7FF8000000000000."""
    zero = x == 0.0
    nan = x != x
    inf = jnp.isinf(x)
    neg = jnp.where(zero, 1.0 / jnp.where(zero, x, 1.0) < 0, x < 0.0)
    a = jnp.abs(x)
    # unbiased exponent E in [-1023, 1023]: largest E with 2^E <= a
    # (E = -1023 collects every subnormal; their e-field is 0)
    E = jnp.full(x.shape, -1023, jnp.int32)
    for j in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        cand = E + j
        ok = (cand <= 1023) & (a >= _exact_pow2(jnp.clip(cand, -1023,
                                                         1023)))
        E = jnp.where(ok, cand, E)
    normal = (E >= -1022) & ~zero & ~nan & ~inf
    subnorm = (E < -1022) & ~zero & ~nan & ~inf
    # normal: a * 2^-E in [1, 2) exactly; mant = (a*2^-E - 1) * 2^52.
    # Scale in two halves: a single 2^-E factor would itself be
    # SUBNORMAL for E = 1023 (2^-1023) and flush to 0 under FTZ —
    # halving keeps every factor and intermediate normal.
    Ec = jnp.clip(E, -1022, 1023)
    h1 = Ec // 2
    h2 = Ec - h1
    scaled_n = (a * _exact_pow2(-h1)) * _exact_pow2(-h2)
    mant_n = (scaled_n - 1.0) * float(2.0 ** 52)
    # subnormal: mant = a * 2^1022 * 2^52 (two exact scales)
    mant_s = (a * float(2.0 ** 1022)) * float(2.0 ** 52)
    mant = jnp.where(normal, mant_n, jnp.where(subnorm, mant_s, 0.0))
    hi22 = jnp.floor(mant * float(2.0 ** -32))
    lo_f = mant - hi22 * float(2.0 ** 32)
    e_field = jnp.where(normal, (E + 1023).astype(jnp.uint32),
                        jnp.where(inf | nan, jnp.uint32(2047),
                                  jnp.uint32(0)))
    hi = ((jnp.where(neg & ~nan, jnp.uint32(1), jnp.uint32(0))
           << jnp.uint32(31))
          | (e_field << jnp.uint32(20))
          | hi22.astype(jnp.uint32))
    lo = lo_f.astype(jnp.uint32)
    hi = jnp.where(nan, jnp.uint32(0x7FF80000), hi)
    lo = jnp.where(nan | inf | zero, jnp.uint32(0), lo)
    return lo, hi


def combine_words(lo: jnp.ndarray, hi: jnp.ndarray, dtype) -> jnp.ndarray:
    """(lo, hi) u32 words -> 64-bit array of ``dtype`` WITHOUT the
    reverse bitcast: ``bitcast_convert_type(u32[n,2], 64-bit)`` hits an
    unimplemented case in the x64 rewriter when its result feeds further
    computation (observed on v5e).  Integers recombine with exact signed
    arithmetic (all bit patterns).  f64 is re-carved via ldexp: exact
    for normals/zeros/infinities; NaNs collapse to the canonical NaN and
    subnormals flush to +-0 where the backend flushes them in arithmetic
    (XLA CPU does; every arithmetic op in the engine already has that
    behavior there, so compaction matches the pipeline around it)."""
    dt = jnp.dtype(dtype)
    if dt == jnp.dtype(jnp.uint64):
        u = (hi.astype(jnp.uint64) * jnp.uint64(1 << 32)
             + lo.astype(jnp.uint64))
        return jax.lax.optimization_barrier(u)
    if dt == jnp.dtype(jnp.int64):
        hi_s = jax.lax.bitcast_convert_type(hi, jnp.int32)
        v = (hi_s.astype(jnp.int64) * jnp.int64(1 << 32)
             + lo.astype(jnp.int64))
        return jax.lax.optimization_barrier(v)
    assert dt == jnp.dtype(jnp.float64), dt
    s = jnp.where((hi >> 31) != 0, -1.0, 1.0)
    e = ((hi >> 20) & jnp.uint32(0x7FF)).astype(jnp.int32)
    mhi = (hi & jnp.uint32(0xFFFFF)).astype(jnp.float64)
    mant = mhi * 4294967296.0 + lo.astype(jnp.float64)  # exact, < 2^52
    frac = mant * float(2.0 ** -52)
    normal = (frac + 1.0) * _exact_pow2(e - 1023)
    subnorm = frac * float(2.0 ** -1022)
    special = jnp.where(mant == 0.0, jnp.inf, jnp.nan)
    mag = jnp.where(e == 0, subnorm,
                    jnp.where(e == 2047, special, normal))
    return s * mag


def _exact_pow2(k: jnp.ndarray) -> jnp.ndarray:
    """Exact f64 2**k for integer k in [-1023, 1023], via
    square-and-multiply over power-of-two CONSTANTS (each multiply is an
    exact scale; no ldexp — jnp.ldexp internally bitcasts s64, which the
    x64 rewriter cannot handle in-context on this backend)."""
    neg = k < 0
    a = jnp.where(neg, -k, k)
    y = jnp.ones(k.shape, jnp.float64)
    for j in range(10):  # bits 0..9 cover |k| <= 1023
        cpos = float(2.0 ** (1 << j))
        cneg = float(2.0 ** -(1 << j))
        c = jnp.where(neg, cneg, cpos)
        y = y * jnp.where(((a >> j) & 1) != 0, c, 1.0)
    return y
