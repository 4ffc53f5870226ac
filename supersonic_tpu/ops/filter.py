"""Filter: BOOL predicate -> compacted survivors.

Reference: cursor/core/filter.cc:65-230 — evaluate predicate (NULL counts
as false, filter.cc:169-198), build a selection row-id list, gather
surviving rows.  TPU redesign: survivors move via stable payload-sort
compaction (``compact_by_mask``: tiled batched sorts + in-order stitch
on large inputs), with ``compaction_indices`` as the selection-vector
primitive for consumers that need explicit row ids — no branchy row
loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..batch import Column, Table, gather_table
from ..exprs.base import Expression
from ..types import DataType
from .base import BindContext, BoundOperation, Operation, RunContext


def compaction_indices(mask: jnp.ndarray, out_capacity: int):
    """Stable selection vector of True positions.

    Returns (indices[out_capacity] with out-of-range sentinel padding,
    count).  This is the reference's PrepareInputRowIds
    (filter.cc:169-198) as a data-parallel primitive.
    """
    cap = mask.shape[0]
    # int32 cumsum + scatter (NOT jnp.nonzero: under x64 its index cumsum
    # is int64, which lowers to an emulated u32-pair reduce-window on TPU
    # and overflows scoped VMEM on multi-million-row columns)
    from .scan32 import cumsum_i32
    pos = cumsum_i32(mask) - 1
    iota = jnp.arange(cap, dtype=jnp.int32)
    scatter_idx = jnp.where(mask & (pos < out_capacity), pos, out_capacity)
    idx = jnp.full(out_capacity, cap, dtype=jnp.int32).at[scatter_idx].set(
        iota, mode="drop")
    count = jnp.minimum(jnp.sum(mask.astype(jnp.int32), dtype=jnp.int32), out_capacity)
    return idx, count


_TILE = 32768       # rows per compaction tile
_TILED_MIN = 4 * _TILE  # below this, one global sort is cheaper


def _fit(vals: jnp.ndarray, out_cap: int) -> jnp.ndarray:
    n = vals.shape[0]
    if out_cap < n:
        return vals[:out_cap]
    if out_cap > n:
        return jnp.concatenate([vals, jnp.zeros(out_cap - n, vals.dtype)])
    return vals


def _compact_via_kernel(payload: list[jnp.ndarray], mask: jnp.ndarray,
                        out_cap: int):
    """Route through the Pallas compaction kernel (kernels/compaction.py):
    i64/u64 payloads ride as two u32 lanes (bitcast ``split_words``),
    sub-32-bit as i32.  f64 columns move with the SORT scheme under the
    same mask (stable => same permutation): the f64 word carve
    (``_split_f64_words``) costs more than it saves here — measured on
    v5e r4, 8M x (f32,i32,f64): sort fallback 18.0 ms vs kernel+carve
    30.6 ms — and the sort moves f64 bit-exactly where the carve pays
    the NaN/subnormal carve-out.  (The carve DOES win where the
    fallback is the whole operator: merge keys, spread expansion.)
    Returns None when ineligible (CPU backend, too-small input, too
    many lanes)."""
    from ..kernels import compaction, force_kernel_paths

    cap = mask.shape[0]
    if not force_kernel_paths() and (
            jax.default_backend() == "cpu" or cap < 4 * compaction.TILE):
        return None
    split: list[jnp.ndarray] = []
    spec: list[tuple] = []  # (kind, dtype, lane_index)
    sort_side: list[tuple[int, jnp.ndarray]] = []  # f64 columns
    for pi, p in enumerate(payload):
        size = jnp.dtype(p.dtype).itemsize
        if p.dtype == jnp.float64:
            spec.append(("sort", p.dtype, len(sort_side)))
            sort_side.append((pi, p))
        elif size == 4:
            spec.append(("pass", p.dtype, len(split)))
            split.append(p)
        elif size == 8:
            lo, hi = compaction.split_words(p)
            spec.append(("wide", p.dtype, len(split)))
            split.append(lo)
            split.append(hi)
        else:  # bool / 16-bit
            spec.append(("narrow", p.dtype, len(split)))
            split.append(p.astype(jnp.int32))
    if len(split) > compaction.MAX_PAYLOADS:
        return None
    sorted_f64: list[jnp.ndarray] = []
    if sort_side:
        sorted_f64 = _compact_via_sort([p for _, p in sort_side], mask,
                                       out_cap)
    if not split:
        return sorted_f64 if len(sorted_f64) == len(payload) else None
    res, _cnt = compaction.compact_kernel(split, mask, out_cap)
    out: list[jnp.ndarray] = []
    for kind, dtype, i in spec:
        if kind == "pass":
            out.append(res[i])
        elif kind == "wide":
            out.append(compaction.combine_words(res[i], res[i + 1], dtype))
        elif kind == "sort":
            out.append(sorted_f64[i])
        else:
            out.append(res[i].astype(dtype))
    return out


def compact_arrays(payload: list[jnp.ndarray], mask: jnp.ndarray,
                   out_cap: int) -> list[jnp.ndarray]:
    """Stable-compact rows where ``mask`` is True to a dense prefix of
    each payload array (raw-array engine behind ``compact_by_mask``).

    TPU path: the single-pass Pallas compaction kernel
    (kernels/compaction.py) — ~7x the sort scheme at 8M rows.  Fallback
    (CPU, small inputs, exotic payload sets): payload *sorts* — XLA's
    TPU sort moves all payloads in lockstep and beats a
    selection-vector + per-column gather by ~2x.  Large inputs use a
    two-phase tiled variant — compact each tile independently with a
    *batched* per-tile sort (bitonic depth (log T)^2 instead of
    (log n)^2), then stitch tiles with overlapping dynamic-update-slice
    writes at each tile's running offset, in order by a fori_loop.
    """
    fast = _compact_via_kernel(payload, mask, out_cap)
    if fast is not None:
        return fast
    return _compact_via_sort(payload, mask, out_cap)


def _compact_via_sort(payload: list[jnp.ndarray], mask: jnp.ndarray,
                      out_cap: int) -> list[jnp.ndarray]:
    cap = mask.shape[0]
    if cap >= _TILED_MIN:
        T = _TILE
        n_pad = -(-cap // T) * T
        pad = n_pad - cap
        m = jnp.concatenate([mask, jnp.zeros(pad, jnp.bool_)]) if pad \
            else mask
        key = jnp.where(m, 0, 1).astype(jnp.int32).reshape(-1, T)
        tiles = []
        for p in payload:
            pp = jnp.concatenate([p, jnp.zeros(pad, p.dtype)]) if pad else p
            tiles.append(pp.reshape(-1, T))
        res = jax.lax.sort([key] + tiles, dimension=1, num_keys=1,
                           is_stable=True)
        # pin int32: under x64 the sum/cumsum promote to int64, which
        # lowers to an emulated u32-pair reduce-window that blows scoped
        # VMEM (same trap as the join's expansion cumsum)
        counts = jnp.sum(m.reshape(-1, T).astype(jnp.int32), axis=1,
                         dtype=jnp.int32)
        offs = jnp.cumsum(counts, dtype=jnp.int32) - counts
        nt = n_pad // T
        outs = [jnp.zeros(n_pad + T, p.dtype) for p in payload]

        def body(t, outs):
            o = offs[t]
            new = []
            for out, src in zip(outs, res[1:]):
                row = jax.lax.dynamic_slice(src, (t, 0), (1, T))[0]
                new.append(jax.lax.dynamic_update_slice(out, row, (o,)))
            return tuple(new)

        sorted_cols = list(jax.lax.fori_loop(0, nt, body, tuple(outs)))
    else:
        key = jnp.where(mask, 0, 1).astype(jnp.int32)
        sorted_cols = list(jax.lax.sort([key] + payload, num_keys=1,
                                        is_stable=True))[1:]
    return [_fit(c, out_cap) for c in sorted_cols]


def compact_by_mask(table: Table, mask: jnp.ndarray,
                    out_capacity: int | None = None) -> Table:
    """Move rows where mask is True into a dense prefix (see
    ``compact_arrays`` for the sort-based engine)."""
    out_cap = out_capacity or table.capacity
    count = jnp.minimum(jnp.sum(mask.astype(jnp.int32), dtype=jnp.int32), out_cap)
    if len(table.schema) == 0:
        return Table(table.schema, {}, count, dict(table.dicts),
                     cap_hint=out_cap)
    payload: list[jnp.ndarray] = []
    layout: list[tuple[str, bool]] = []  # (name, has_valid)
    for name in table.schema.names():
        c = table.columns[name]
        payload.append(c.values)
        if c.valid is not None:
            payload.append(c.valid)
            layout.append((name, True))
        else:
            layout.append((name, False))

    sorted_cols = compact_arrays(payload, mask, out_cap)
    cols: dict[str, Column] = {}
    i = 0
    for name, has_valid in layout:
        vals = sorted_cols[i]
        i += 1
        valid = None
        if has_valid:
            valid = sorted_cols[i]
            i += 1
        cols[name] = Column(vals, valid)
    return Table(table.schema, cols, count, dict(table.dicts),
                 cap_hint=out_cap)


def unwrap_filters(op):
    """Peel Filter wrappers off a plan node: (inner_child, [predicates]).

    Sort / GroupAggregate / HashJoin fuse a child Filter by folding the
    predicate into their own sort's pad key — the filtered rows sort last
    and are excluded by the valid-row count, so the compaction sort
    disappears entirely (reference analogue: Supersonic pipelines the
    filter per view; here the fusion is across operators).
    """
    preds = []
    while isinstance(op, Filter):
        preds.append(op.predicate)
        op = op.child
    return op, preds


def bind_predicates(preds, cb):
    from ..types import DataType as _DT, TypeError_
    bounds = []
    for p in preds:
        b = p.bind(cb.schema, cb.dicts)
        if b.type != _DT.BOOL:
            raise TypeError_(f"filter predicate must be BOOL, got {b.type}")
        bounds.append(b)
    return bounds


def keep_mask(bound_preds, rctx, t: Table) -> jnp.ndarray:
    """row_mask AND all predicates (NULL counts as false)."""
    keep = t.row_mask()
    ectx = rctx.eval_context(t)
    for b in bound_preds:
        v = b.evaluate(ectx)
        keep = keep & v.values & v.valid_or_true()
    return keep


class Filter(Operation):
    def __init__(self, predicate: Expression, child: Operation,
                 out_capacity: int | None = None):
        self.predicate = predicate
        self.child = child
        self.out_capacity = out_capacity

    def bind(self, ctx: BindContext) -> BoundOperation:
        cb = self.child.bind(ctx)
        pred = self.predicate.bind(cb.schema, cb.dicts)
        if pred.type != DataType.BOOL:
            from ..types import TypeError_
            raise TypeError_(f"filter predicate must be BOOL, got {pred.type}")
        out_cap = self.out_capacity or cb.capacity

        def fn(rctx: RunContext) -> Table:
            t = cb.run(rctx)
            v = pred.evaluate(rctx.eval_context(t))
            keep = v.values & v.valid_or_true() & t.row_mask()
            return compact_by_mask(t, keep, out_cap)

        return BoundOperation(cb.schema, cb.dicts, fn, out_cap,
                              stats=dict(cb.stats), dup=dict(cb.dup))
