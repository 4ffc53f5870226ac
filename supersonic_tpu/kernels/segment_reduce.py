"""Pallas TPU kernel: segmented reduction to a small number of segments.

This is the aggregation hot path (reference: the scatter-update inner loop
of ColumnAggregator, column_aggregator.cc:78-196).  XLA lowers
``jax.ops.segment_sum`` to a serial HBM scatter (~70ms for 8M rows on
v5e); this kernel instead streams row tiles through VMEM and combines
into a [K]-sized accumulator held on-chip, with segment ids matched
against a lane-resident segment iota — pure VPU work, bandwidth-bound.

Supports f32/i32 values and K <= MAX_SEGMENTS; other dtypes /
cardinalities fall back to XLA segment ops (see ops/aggregate.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 64
LANES = 128
TILE = SUBLANES * LANES  # rows per grid step
MAX_SEGMENTS = 2048


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported_dtype(dtype) -> bool:
    return jnp.dtype(dtype) in (jnp.dtype(jnp.float32), jnp.dtype(jnp.int32))


def _reduce_kernel(v_ref, g_ref, o_ref, *, k_pad: int, mode: str, init):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.full_like(o_ref, init)

    v = v_ref[:]                     # [SUBLANES, LANES]
    g = g_ref[:]                     # [SUBLANES, LANES]
    for kr in range(k_pad // LANES):
        k_lane = (jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                  + kr * LANES)
        match = g[:, :, None] == k_lane[None, :, :]   # [S, L, LANES]
        neutral = jnp.full_like(v, init)
        sel = jnp.where(match, v[:, :, None], neutral[:, :, None])
        # static-row ref read-modify-write ('.at[].set' on a value would
        # lower to an unsupported scatter in Mosaic)
        if mode == "sum":
            # pin dtype: under x64, jnp.sum would promote i32 -> i64,
            # which Mosaic can't lower
            contrib = jnp.sum(sel, axis=(0, 1), dtype=sel.dtype)
            o_ref[kr, :] = o_ref[kr, :] + contrib
        elif mode == "min":
            contrib = jnp.min(sel, axis=(0, 1))
            o_ref[kr, :] = jnp.minimum(o_ref[kr, :], contrib)
        else:
            contrib = jnp.max(sel, axis=(0, 1))
            o_ref[kr, :] = jnp.maximum(o_ref[kr, :], contrib)


@functools.partial(jax.jit, static_argnames=("num_segments", "mode"))
def segment_reduce_small(values: jnp.ndarray, segment_ids: jnp.ndarray,
                         num_segments: int, mode: str = "sum") -> jnp.ndarray:
    """Segmented sum/min/max into ``num_segments`` buckets; out-of-range
    segment ids are dropped."""
    assert mode in ("sum", "min", "max")
    n = values.shape[0]
    dtype = values.dtype
    k_pad = _round_up(max(num_segments, 1), LANES)
    n_pad = _round_up(max(n, 1), TILE)
    # init must be a static python scalar: the kernel closure may not
    # capture traced constants
    floating = jnp.issubdtype(dtype, jnp.floating)
    if mode == "sum":
        init = 0.0 if floating else 0
    elif mode == "min":
        init = float("inf") if floating else int(jnp.iinfo(dtype).max)
    else:
        init = float("-inf") if floating else int(jnp.iinfo(dtype).min)
    pad_rows = n_pad - n
    v = jnp.concatenate([values, jnp.full(pad_rows, init, dtype)]) \
        if pad_rows else values
    gid = jnp.where((segment_ids >= 0) & (segment_ids < num_segments),
                    segment_ids.astype(jnp.int32), k_pad)
    g = jnp.concatenate([gid, jnp.full(pad_rows, k_pad, jnp.int32)]) \
        if pad_rows else gid
    v2 = v.reshape(n_pad // LANES, LANES)
    g2 = g.reshape(n_pad // LANES, LANES)
    # Mosaic rejects the i64 index/return types that global x64 mode
    # injects into the kernel MLIR; trace the pallas_call with x64 off
    # (operand dtypes are 32-bit already).
    with jax.enable_x64(False):
        return _call_kernel(v2, g2, n_pad, k_pad, mode, init, dtype,
                            num_segments)


def _call_kernel(v2, g2, n_pad, k_pad, mode, init, dtype, num_segments):
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, k_pad=k_pad, mode=mode, init=init),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_pad // LANES, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad // LANES, LANES), dtype),
        interpret=jax.default_backend() == "cpu",
    )(v2, g2)
    return out.reshape(k_pad)[:num_segments]


# ---------------------------------------------------------------------------
# Fused multi-aggregation variant: one streaming pass over (ids, values...)
# computes MANY segmented reductions at once.  The [rows x K] lane match is
# the kernel's dominant compute; sharing it across all requested
# reductions makes an N-aggregate group-by cost ~one pass instead of N
# (reference analogue: Aggregator updates all ColumnAggregators per input
# view in one sweep, aggregator.h:40-90).
# ---------------------------------------------------------------------------

def _multi_kernel(g_ref, *refs, k_pad: int, modes, inits, dots,
                  firstpos, num_segments):
    nreq = len(modes)
    v_refs = refs[:nreq]
    o_refs = refs[nreq:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for j in range(nreq):
            if firstpos[j]:
                # padding slots [num_segments, k_pad) start BELOW init so
                # the early-exit test "any slot still == init" is not
                # pinned true by slots that can never match
                rows = o_refs[j].shape[0]
                slot = (jax.lax.broadcasted_iota(
                    jnp.int32, (rows, LANES), 0) * LANES
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (rows, LANES), 1))
                o_refs[j][:] = jnp.where(
                    slot < num_segments,
                    jnp.full_like(o_refs[j], inits[j]),
                    jnp.full_like(o_refs[j], inits[j] - 1))
            else:
                o_refs[j][:] = jnp.full_like(o_refs[j], inits[j])

    g = g_ref[:]
    vs = [v_refs[j][:] for j in range(nreq)]
    dot_reqs = [j for j in range(nreq) if dots[j]]
    fp_reqs = [j for j in range(nreq) if firstpos[j]]
    match_reqs_all = [j for j in range(nreq)
                      if not dots[j] and not firstpos[j]]

    if fp_reqs:
        # First-position requests (insertion-order rank / FIRST): values
        # are the row position, which is tile-monotone — once a slot
        # holds any value, later tiles cannot lower it.  The whole match
        # pass is therefore skipped once every real slot has been seen
        # (for dense key domains that is after the first few tiles, which
        # removes the masked-min pass that otherwise costs as much as all
        # the MXU-dot aggregates combined).
        # f32 indicator sum: Mosaic's bool `any` proxy and x64-promoted
        # integer sums both lower through 64-bit scalar squeezes it
        # rejects; a float32 sum reduced to a scalar lowers cleanly
        unseen = jnp.zeros((), jnp.float32)
        for j in fp_reqs:
            unseen = unseen + jnp.sum(
                (o_refs[j][:] == inits[j]).astype(jnp.float32))
        need = unseen > 0.5

        @pl.when(need)
        def _():
            for kr in range(k_pad // LANES):
                k_lane = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, LANES), 1) + kr * LANES)
                match = g[:, :, None] == k_lane[None, :, :]
                for j in fp_reqs:
                    v = vs[j]
                    neutral = jnp.full_like(v, inits[j])
                    sel = jnp.where(match, v[:, :, None],
                                    neutral[:, :, None])
                    contrib = jnp.min(sel, axis=(0, 1))
                    o_refs[j][kr, :] = jnp.minimum(o_refs[j][kr, :],
                                                   contrib)
    if dot_reqs and match_reqs_all and k_pad == LANES:
        # unified per-sublane pass: the boolean one-hot is built ONCE per
        # sublane and shared by every request — the f32 sums ride it as
        # MXU dots, the min/max/int-sum requests as masked VPU reduces.
        # Splitting into separate dot/match passes costs a second full
        # compare stream (the dominant term); sharing removes it.
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, k_pad), 1)
        daccs = {j: jnp.zeros((1, k_pad), jnp.float32) for j in dot_reqs}
        maccs = {j: jnp.full((1, k_pad), inits[j], vs[j].dtype)
                 for j in match_reqs_all}
        for s in range(SUBLANES):
            ohb = g[s, :][:, None] == k_iota          # [L, K] shared
            oh = ohb.astype(jnp.float32)
            for j in dot_reqs:
                daccs[j] = daccs[j] + jax.lax.dot_general(
                    vs[j][s:s + 1, :], oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            for j in match_reqs_all:
                v = vs[j]
                sel = jnp.where(ohb, v[s, :][:, None],
                                jnp.asarray(inits[j], v.dtype))
                if modes[j] == "sum":
                    red = jnp.sum(sel, axis=0, keepdims=True,
                                  dtype=sel.dtype)
                    maccs[j] = maccs[j] + red
                elif modes[j] == "min":
                    red = jnp.min(sel, axis=0, keepdims=True)
                    maccs[j] = jnp.minimum(maccs[j], red)
                else:
                    red = jnp.max(sel, axis=0, keepdims=True)
                    maccs[j] = jnp.maximum(maccs[j], red)
        for j in dot_reqs:
            o_refs[j][:] = o_refs[j][:] + daccs[j]
        for j in match_reqs_all:
            if modes[j] == "sum":
                o_refs[j][0, :] = o_refs[j][0, :] + maccs[j][0, :]
            elif modes[j] == "min":
                o_refs[j][0, :] = jnp.minimum(o_refs[j][0, :],
                                              maccs[j][0, :])
            else:
                o_refs[j][0, :] = jnp.maximum(o_refs[j][0, :],
                                              maccs[j][0, :])
        return
    if dot_reqs:
        # f32 sums ride the MXU: per sublane, one-hot [L, K] built once
        # and shared across requests; each request adds one [1,L]@[L,K]
        # dot.  ~1.5x the lane-match path, and extra sum requests are
        # nearly free (the one-hot build dominates).
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, k_pad), 1)
        accs = {j: jnp.zeros((1, k_pad), jnp.float32) for j in dot_reqs}
        for s in range(SUBLANES):
            oh = (g[s, :][:, None] == k_iota).astype(jnp.float32)
            for j in dot_reqs:
                accs[j] = accs[j] + jax.lax.dot_general(
                    vs[j][s:s + 1, :], oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        for j in dot_reqs:
            o_refs[j][:] = o_refs[j][:] + accs[j]
    match_reqs = [j for j in range(nreq)
                  if not dots[j] and not firstpos[j]]
    if match_reqs:
        for kr in range(k_pad // LANES):
            k_lane = (jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                      + kr * LANES)
            match = g[:, :, None] == k_lane[None, :, :]   # [S, L, LANES]
            for j in match_reqs:
                v = vs[j]
                neutral = jnp.full_like(v, inits[j])
                sel = jnp.where(match, v[:, :, None], neutral[:, :, None])
                if modes[j] == "sum":
                    contrib = jnp.sum(sel, axis=(0, 1), dtype=sel.dtype)
                    o_refs[j][kr, :] = o_refs[j][kr, :] + contrib
                elif modes[j] == "min":
                    contrib = jnp.min(sel, axis=(0, 1))
                    o_refs[j][kr, :] = jnp.minimum(o_refs[j][kr, :], contrib)
                else:
                    contrib = jnp.max(sel, axis=(0, 1))
                    o_refs[j][kr, :] = jnp.maximum(o_refs[j][kr, :], contrib)


def segment_reduce_multi(requests, segment_ids, num_segments: int):
    """Fused segmented reductions: ``requests`` is a list of
    ``(values, mode)`` with mode in {sum,min,max,count}; returns one [K]
    array per request, all computed in a single Pallas pass.
    Out-of-range segment ids are dropped.  All value dtypes must satisfy
    ``supported_dtype``.

    mode "count" declares the values 0/1 indicators (int32) — together
    with f32 sums it takes the MXU one-hot-dot path (exact: counts stay
    below 2^24); i32 value sums and min/max stay on the exact lane-match
    path.  mode "firstpos" declares an i32 min whose values are the row
    POSITION (tile-monotone): the kernel skips its masked-min pass once
    every segment has been seen (dense domains: after the first tiles)."""
    n = segment_ids.shape[0]
    k_pad = _round_up(max(num_segments, 1), LANES)
    n_pad = _round_up(max(n, 1), TILE)
    pad_rows = n_pad - n
    count_exact = n_pad < (1 << 24)  # f32 holds exact integers to 2^24
    modes, inits, v2s, dots, fps, out_dtypes = [], [], [], [], [], []
    for values, mode in requests:
        assert mode in ("sum", "min", "max", "count", "firstpos")
        dtype = values.dtype
        out_dtypes.append(dtype)
        fp = mode == "firstpos"
        if fp:
            assert dtype == jnp.dtype(jnp.int32), dtype
            mode = "min"
            dot = False
        elif mode == "count":
            mode = "sum"
            dot = count_exact
            if dot:
                values = values.astype(jnp.float32)
                dtype = jnp.dtype(jnp.float32)
        else:
            dot = (mode == "sum"
                   and dtype == jnp.dtype(jnp.float32))
        floating = jnp.issubdtype(dtype, jnp.floating)
        if mode == "sum":
            init = 0.0 if floating else 0
        elif mode == "min":
            init = float("inf") if floating else int(jnp.iinfo(dtype).max)
        else:
            init = float("-inf") if floating else int(jnp.iinfo(dtype).min)
        v = jnp.concatenate([values, jnp.full(pad_rows, init, dtype)]) \
            if pad_rows else values
        modes.append(mode)
        inits.append(init)
        dots.append(dot)
        fps.append(fp)
        v2s.append(v.reshape(n_pad // LANES, LANES))
    gid = jnp.where((segment_ids >= 0) & (segment_ids < num_segments),
                    segment_ids.astype(jnp.int32), k_pad)
    g = jnp.concatenate([gid, jnp.full(pad_rows, k_pad, jnp.int32)]) \
        if pad_rows else gid
    g2 = g.reshape(n_pad // LANES, LANES)
    with jax.enable_x64(False):
        tile_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        acc_spec = pl.BlockSpec((k_pad // LANES, LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        dot_spec = pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            functools.partial(_multi_kernel, k_pad=k_pad,
                              modes=tuple(modes), inits=tuple(inits),
                              dots=tuple(dots), firstpos=tuple(fps),
                              num_segments=num_segments),
            grid=(n_pad // TILE,),
            in_specs=[tile_spec] * (1 + len(requests)),
            out_specs=[dot_spec if d else acc_spec for d in dots],
            out_shape=[jax.ShapeDtypeStruct(
                (1, k_pad) if d else (k_pad // LANES, LANES),
                v.dtype) for d, v in zip(dots, v2s)],
            interpret=jax.default_backend() == "cpu",
        )(g2, *v2s)
    res = []
    for o, odt in zip(outs, out_dtypes):
        flat = o.reshape(k_pad)[:num_segments]
        res.append(flat if flat.dtype == odt
                   else jnp.round(flat).astype(odt))
    return res
