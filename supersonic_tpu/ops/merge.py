"""MergeUnionAll: k-way merge of same-schema sorted inputs.

Reference: cursor/core/merge_union_all.cc:127 — a row-oriented priority
queue over child iterators, deterministic order (ties broken by child
index, then child row order).  TPU redesign: a k-way merge of
already-sorted streams is exactly a stable sort of the concatenation by
(key tuple, child index) — one ``lax.sort`` whose comparator equals the
reference's queue order, fully parallel instead of row-at-a-time.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import Column, Table, gather_table
from ..dictionary import merge as dict_merge
from ..schema import Attribute, SchemaError, TupleSchema
from ..types import DataType
from ..kernels.lut_gather import take_small
from .base import BindContext, BoundOperation, Operation, RunContext
from .keys import key_operands
from .sort import SortOrder


class MergeUnionAll(Operation):
    def __init__(self, order: SortOrder | Sequence, children: Sequence[Operation]):
        self.order = order if isinstance(order, SortOrder) else SortOrder(order)
        self.children = list(children)
        if not self.children:
            raise SchemaError("MergeUnionAll needs at least one input")

    def bind(self, ctx: BindContext) -> BoundOperation:
        cbs = [c.bind(ctx) for c in self.children]
        schema = cbs[0].schema
        for cb in cbs[1:]:
            if tuple((a.name, a.type) for a in cb.schema) != \
                    tuple((a.name, a.type) for a in schema):
                raise SchemaError("MergeUnionAll inputs must share schema")
        # output nullability: any input nullable
        attrs = [Attribute(a.name, a.type,
                           any(cb.schema.lookup(a.name).nullable
                               for cb in cbs), a.enum)
                 for a in schema]
        out_schema = TupleSchema(attrs)
        # merge string dictionaries across inputs (bind-time remaps)
        remaps: list[dict[str, jnp.ndarray]] = [dict() for _ in cbs]
        out_dicts = {}
        import numpy as np
        for a in schema:
            if a.type in (DataType.STRING, DataType.BINARY):
                merged = cbs[0].dicts[a.name]
                maps = [np.arange(max(len(merged), 1), dtype=np.int32)]
                for cb in cbs[1:]:
                    merged, ra, rb = dict_merge(merged, cb.dicts[a.name])
                    maps = [ra[m] if m.size else m for m in maps]
                    maps.append(rb)
                out_dicts[a.name] = merged
                for i, m in enumerate(maps):
                    remaps[i][a.name] = jnp.asarray(m)
            else:
                pass
        order = self.order
        out_cap = sum(cb.capacity for cb in cbs)
        n_children = len(cbs)

        def fn(rctx: RunContext) -> Table:
            tables = [cb.run(rctx) for cb in cbs]
            # remap string codes into the merged dictionaries
            patched = []
            for i, t in enumerate(tables):
                cols = dict(t.columns)
                for name, lut in remaps[i].items():
                    c = cols[name]
                    cols[name] = Column(take_small(lut, c.values),
                                        c.valid)
                patched.append(Table(out_schema, cols, t.num_rows,
                                     out_dicts, cap_hint=t.capacity))
            # concatenate columns + child index + local rowid
            num_rows = sum(t.num_rows for t in tables)
            cat_cols = {}
            for a in out_schema:
                vals = jnp.concatenate(
                    [p.columns[a.name].values for p in patched])
                valid = (jnp.concatenate(
                    [p.columns[a.name].valid_or_true() for p in patched])
                    if a.nullable else None)
                cat_cols[a.name] = Column(vals, valid)
            child_idx = jnp.concatenate(
                [jnp.full(t.capacity, i, dtype=jnp.int32)
                 for i, t in enumerate(tables)])
            live = jnp.concatenate([t.row_mask() for t in tables])
            fast = _merge_via_kernel(patched, order, out_schema, out_dicts,
                                     num_rows, out_cap)
            if fast is not None:
                return fast
            cat = Table(out_schema, cat_cols, num_rows, out_dicts,
                        cap_hint=out_cap)
            # one stable sort = the reference's priority-queue order:
            # (pad, key tuple, child index); stability keeps child row order
            operands, nk = key_operands(cat, order.names(),
                                        order.ascendings())
            pad = jnp.where(live, 0, 1).astype(jnp.int32)
            operands[0] = pad  # key_operands' pad uses num_rows prefix;
            # concatenated liveness is interleaved, so override it
            rowid = jnp.arange(out_cap, dtype=jnp.int32)
            res = jax.lax.sort(operands + [child_idx, rowid],
                               num_keys=nk + 1, is_stable=True)
            perm = res[-1]
            return gather_table(cat, perm, num_rows)

        return BoundOperation(out_schema, out_dicts, fn, out_cap)


def _sortable_i32(op: jnp.ndarray):
    """a key-operand array -> order-equivalent int32 word list, or None.

    f32 maps through the SIGNED IEEE total-order bit transform; i64
    codes return TWO i32 words (signed high, sign-flipped low) compared
    lexicographically; f64 likewise returns two words via the 64-bit
    total-order transform done word-wise (f64 -> u32[..,2] bitcast works
    on this backend — probed r4; only the reverse direction is
    unimplemented).  ±0 orders -0 < +0 under the total order where the
    reference comparator calls them equal — tie order only, and the
    reference's merge determinism contract concerns child order on
    equal keys its unstable comparator actually distinguishes."""
    dt = jnp.dtype(op.dtype)
    if dt == jnp.dtype(jnp.int32):
        return [op]
    if dt == jnp.dtype(jnp.float32):
        # SIGNED-ascending IEEE total order: f >= 0 keeps its bit pattern
        # (already ascending, >= 0); f < 0 maps to ~bits ^ INT32_MIN
        # (ascending, < 0).  (The previous `where(i < 0, ~i, i ^ MIN)`
        # form is the *unsigned* transform — under the kernel's signed
        # compares it ordered every positive below every negative;
        # latent because no test merged mixed-sign f32 keys.)
        i = jax.lax.bitcast_convert_type(op, jnp.int32)
        flipped = jnp.where(i >= 0, i, ~i ^ jnp.int32(-2147483648))
        return [flipped]
    if dt == jnp.dtype(jnp.int64):
        from ..kernels.compaction import split_words

        lo, hi = split_words(op)
        hi_s = jax.lax.bitcast_convert_type(hi, jnp.int32)
        lo_s = (jax.lax.bitcast_convert_type(lo, jnp.int32)
                ^ jnp.int32(-2147483648))
        return [hi_s, lo_s]
    if dt == jnp.dtype(jnp.float64):
        from ..kernels.compaction import split_words

        lo, hi = split_words(op)  # u32 words of the f64 bits
        hi_s = jax.lax.bitcast_convert_type(hi, jnp.int32)
        lo_s = (jax.lax.bitcast_convert_type(lo, jnp.int32)
                ^ jnp.int32(-2147483648))
        neg = hi_s < 0
        w1 = jnp.where(neg, ~hi_s ^ jnp.int32(-2147483648), hi_s)
        w2 = jnp.where(neg, ~lo_s, lo_s)
        return [w1, w2]
    if dt == jnp.dtype(jnp.bool_):
        return [op.astype(jnp.int32)]
    return None


def _merge_via_kernel(tables, order, out_schema, out_dicts, num_rows,
                      out_cap):
    """Fold-left pairwise merge through the Pallas bitonic merge kernel
    (kernels/merge_sorted.py) — log-depth merge stages instead of a full
    sort of the concatenation (~15x at 8M rows).  Child tie order is
    preserved by the fold (child i always enters as the A side before
    child i+1).  Returns None when ineligible."""
    from ..kernels import force_kernel_paths, merge_sorted as MK

    if not force_kernel_paths() and (
            jax.default_backend() == "cpu" or out_cap < 2 * MK.TILE):
        return None

    def side_arrays(t: Table):
        ops, _nk = key_operands(t, order.names(), order.ascendings())
        keys = []
        for op in ops:
            s = _sortable_i32(op)
            if s is None:
                return None
            keys.extend(s)
        pays = []
        spec = []
        for a in out_schema:
            c = t.columns[a.name]
            dt = jnp.dtype(c.values.dtype)
            if dt.itemsize == 8:
                from ..kernels.compaction import split_words

                lo, hi = split_words(c.values)
                pays.extend([lo, hi])
                spec.append(("wide", a, c.valid is not None, dt))
            elif dt.itemsize == 4:
                pays.append(c.values)
                spec.append(("pass", a, c.valid is not None, dt))
            else:
                pays.append(c.values.astype(jnp.int32))
                spec.append(("narrow", a, c.valid is not None, dt))
            if c.valid is not None or a.nullable:
                pays.append(c.valid_or_true().astype(jnp.int32))
        return keys, pays, spec

    sides = []
    spec0 = None
    for t in tables:
        sa = side_arrays(t)
        if sa is None:
            return None
        keys, pays, spec = sa
        if len(keys) + len(pays) + 1 > MK.MAX_ARRAYS:
            return None
        sides.append((keys, pays))
        spec0 = spec
    ak, ap = sides[0]
    acc_cap = tables[0].capacity
    for (bk, bp), t in zip(sides[1:], tables[1:]):
        acc_cap = acc_cap + t.capacity
        ak, ap = MK.merge_sorted(ak, ap, bk, bp, acc_cap)
    # rebuild columns from merged payload lanes
    cols = {}
    i = 0
    for kind, a, has_valid, dt in spec0:
        if kind == "wide":
            from ..kernels.compaction import combine_words

            vals = combine_words(ap[i], ap[i + 1], dt)
            i += 2
        elif kind == "pass":
            vals = ap[i]
            i += 1
        else:
            vals = ap[i]
            i += 1
        valid = None
        if has_valid or a.nullable:
            valid = ap[i] != 0
            i += 1
        if kind == "narrow":
            vals = vals.astype(dt)
        cols[a.name] = Column(vals, valid)
    return Table(out_schema, cols, num_rows, out_dicts, cap_hint=out_cap)
