"""Aggregation: GroupAggregate / ScalarAggregate / AggregateClusters.

Reference: cursor/core/aggregate_groups.cc (hash group-by over a
RowHashSet, scatter-updating an Aggregator block), aggregate_scalar.cc,
aggregate_clusters.cc, column_aggregator.cc (per-column update kernels,
COUNT counts non-null, FIRST/LAST keep encounter order, DISTINCT dedups
per key).

TPU redesign (SURVEY.md §2.4, §7.2 step 4): grouping is *sort-based* —
random scatter into a hash table is hostile to a vector machine, so keys
are mapped to monotone codes (ops/keys.py), rows are sorted by key with a
stable ``lax.sort``, segment boundaries mark groups, and every aggregation
is a segmented reduce (``jax.ops.segment_*``).  Output groups are then
re-ranked by first-occurrence row so the result ordering matches the
reference's insertion-order contract bit-for-bit.  ``AggregateClusters``
skips the sort (input already clustered).  The best-effort/pre-group ->
shuffle -> combine algebra (aggregate.h:233-246) lives in
parallel/dist_ops.py.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..batch import Column, Table, gather_table
from ..schema import Attribute, SchemaError, TupleSchema
from ..types import DataType, is_floating, jnp_dtype
from .base import BindContext, BoundOperation, Operation, RunContext
from .keys import group_code_columns, monotone_code


class Aggregation(enum.Enum):
    """reference: proto/supersonic.proto:64-72."""

    SUM = "SUM"
    MIN = "MIN"
    MAX = "MAX"
    COUNT = "COUNT"
    CONCAT = "CONCAT"
    FIRST = "FIRST"
    LAST = "LAST"


SUM, MIN, MAX, COUNT = (Aggregation.SUM, Aggregation.MIN, Aggregation.MAX,
                        Aggregation.COUNT)
FIRST, LAST, CONCAT = Aggregation.FIRST, Aggregation.LAST, Aggregation.CONCAT


@dataclass(frozen=True)
class AggSpec:
    """One aggregation element (reference: AggregationSpecification,
    aggregate.h:47-158)."""

    aggregation: Aggregation
    input: Optional[str]       # None only for COUNT(*)
    output: str
    output_type: Optional[DataType] = None
    distinct: bool = False


class AggregationSpecification:
    def __init__(self, specs: Sequence[AggSpec | tuple] = ()):
        self.specs: list[AggSpec] = []
        for s in specs:
            self.add(s if isinstance(s, AggSpec) else AggSpec(*s))

    def add(self, spec: AggSpec) -> "AggregationSpecification":
        self.specs.append(spec)
        return self

    def add_aggregation(self, agg: Aggregation, input_: Optional[str],
                        output: str, **kw) -> "AggregationSpecification":
        return self.add(AggSpec(agg, input_, output, **kw))


@dataclass(frozen=True)
class GroupAggregateOptions:
    """reference: aggregate.h:160-205.  Memory quotas become static output
    capacities under XLA's static-shape model."""

    estimated_result_row_count: Optional[int] = None  # output capacity
    max_unique_keys_in_result: Optional[int] = None   # clamp; overflow rows
    # merge into the last group (aggregate_groups.cc:501-510)


def _resolve_output_attr(spec: AggSpec, schema: TupleSchema) -> Attribute:
    if spec.aggregation == Aggregation.COUNT:
        t = spec.output_type or DataType.UINT64
        return Attribute(spec.output, t, nullable=False)
    if spec.input is None:
        raise SchemaError(f"{spec.aggregation} needs an input column")
    in_attr = schema.lookup(spec.input)
    t = spec.output_type or in_attr.type
    return Attribute(spec.output, t, nullable=True)


def _min_identity(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf, dtype)
    return jnp.array(jnp.iinfo(dtype).max, dtype)


def _max_identity(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(-jnp.inf, dtype)
    return jnp.array(jnp.iinfo(dtype).min, dtype)


def _seg_sum(data: jnp.ndarray, seg_ids: jnp.ndarray, out_cap: int):
    from ..kernels import segment_reduce as sr

    if out_cap <= sr.MAX_SEGMENTS and sr.supported_dtype(data.dtype):
        return sr.segment_reduce_small(data, seg_ids, out_cap, "sum")
    return jax.ops.segment_sum(data, seg_ids, num_segments=out_cap)


def _seg_min(data: jnp.ndarray, seg_ids: jnp.ndarray, out_cap: int):
    from ..kernels import segment_reduce as sr

    if out_cap <= sr.MAX_SEGMENTS and sr.supported_dtype(data.dtype):
        return sr.segment_reduce_small(data, seg_ids, out_cap, "min")
    return jax.ops.segment_min(data, seg_ids, num_segments=out_cap)


def _seg_max(data: jnp.ndarray, seg_ids: jnp.ndarray, out_cap: int):
    from ..kernels import segment_reduce as sr

    if out_cap <= sr.MAX_SEGMENTS and sr.supported_dtype(data.dtype):
        return sr.segment_reduce_small(data, seg_ids, out_cap, "max")
    return jax.ops.segment_max(data, seg_ids, num_segments=out_cap)


def _aggregate_segments(table: Table, sorted_perm: jnp.ndarray,
                        seg_ids: jnp.ndarray, out_cap: int,
                        specs: list[AggSpec], schema_in: TupleSchema,
                        group_codes: list[jnp.ndarray]):
    """Compute all aggregate output Columns given per-sorted-row segment ids.

    ``seg_ids`` must be out-of-range (== out_cap) for padding rows so the
    segment ops drop them.
    """
    cap = table.capacity
    out_cols: dict[str, Column] = {}
    pos = jnp.arange(cap)
    live = seg_ids < out_cap

    for spec in specs:
        out_attr = _resolve_output_attr(spec, schema_in)
        odt = jnp_dtype(out_attr.type)
        if spec.aggregation == Aggregation.COUNT and spec.input is None:
            cnt = _seg_sum(live.astype(jnp.int32), seg_ids, out_cap)
            out_cols[spec.output] = Column(cnt.astype(odt), None)
            continue
        in_col = table.columns[spec.input]
        vals = jnp.take(in_col.values, sorted_perm)
        valid = jnp.take(in_col.valid_or_true(), sorted_perm) & live
        weight = valid
        if spec.distinct and spec.aggregation in (Aggregation.SUM,
                                                  Aggregation.COUNT):
            # first-of-(group, value) only: compare against previous sorted
            # row (rows are sorted by (key, value) for distinct specs —
            # see caller's extra sort).
            vcode = monotone_code(vals, schema_in.lookup(spec.input).type)
            prev_v = jnp.roll(vcode, 1)
            prev_valid = jnp.roll(valid, 1)
            prev_seg = jnp.roll(seg_ids, 1)
            same = (seg_ids == prev_seg) & (vcode == prev_v) & \
                   (valid == prev_valid) & (pos > 0)
            weight = weight & ~same

        agg = spec.aggregation
        if agg == Aggregation.SUM:
            acc = jnp.where(weight, vals, jnp.zeros_like(vals)).astype(odt)
            s = _seg_sum(acc, seg_ids, out_cap)
            nvalid = _seg_sum(weight.astype(jnp.int32), seg_ids, out_cap)
            out_cols[spec.output] = Column(s, nvalid > 0)
        elif agg == Aggregation.COUNT:
            cnt = _seg_sum(weight.astype(jnp.int32), seg_ids, out_cap)
            out_cols[spec.output] = Column(cnt.astype(odt), None)
        elif agg == Aggregation.MIN:
            acc = jnp.where(weight, vals, _min_identity(vals.dtype))
            m = _seg_min(acc, seg_ids, out_cap)
            nvalid = _seg_sum(weight.astype(jnp.int32), seg_ids, out_cap)
            out_cols[spec.output] = Column(m.astype(odt), nvalid > 0)
        elif agg == Aggregation.MAX:
            acc = jnp.where(weight, vals, _max_identity(vals.dtype))
            m = _seg_max(acc, seg_ids, out_cap)
            nvalid = _seg_sum(weight.astype(jnp.int32), seg_ids, out_cap)
            out_cols[spec.output] = Column(m.astype(odt), nvalid > 0)
        elif agg in (Aggregation.FIRST, Aggregation.LAST):
            # FIRST/LAST take the group's first/last *row* value (including
            # NULL), per the reference's assign-then-noop/assign-always
            # update pair (aggregation_operators.h).
            orig = jnp.take(sorted_perm, pos).astype(jnp.int32)
            if agg == Aggregation.FIRST:
                marker = jnp.where(live, orig, cap + 1)
                sel = _seg_min(marker, seg_ids, out_cap)
            else:
                marker = jnp.where(live, orig, -1)
                sel = _seg_max(marker, seg_ids, out_cap)
            ok = (sel >= 0) & (sel <= cap)
            safe = jnp.clip(sel, 0, cap - 1)
            v = jnp.take(in_col.values, safe).astype(odt)
            vv = jnp.take(in_col.valid_or_true(), safe) & ok
            out_cols[spec.output] = Column(v, vv)
        elif agg == Aggregation.CONCAT:
            raise NotImplementedError(
                "CONCAT aggregation runs on host — use HostGroupConcat "
                "(variable-length strings have no dense device encoding)")
        else:
            raise SchemaError(f"unknown aggregation {agg}")
    return out_cols


class GroupAggregate(Operation):
    """Hash group-by, TPU-style (sort + segmented reduce).

    reference: GroupAggregate (aggregate_groups.cc:980), result ordering =
    key insertion order (RowHashSet append order), reproduced here by
    re-ranking groups on first-occurrence row id.
    """

    best_effort = False

    def __init__(self, group_by: Sequence[str], specification, child,
                 options: GroupAggregateOptions | None = None):
        self.group_by = list(group_by)
        if isinstance(specification, AggregationSpecification):
            self.spec = specification
        else:
            self.spec = AggregationSpecification(specification)
        self.child = child
        self.options = options or GroupAggregateOptions()

    def bind(self, ctx: BindContext) -> BoundOperation:
        cb = self.child.bind(ctx)
        names = self.group_by
        specs = self.spec.specs
        for n in names:
            cb.schema.lookup(n)
        key_attrs = [cb.schema.lookup(n) for n in names]
        agg_attrs = [_resolve_output_attr(s, cb.schema) for s in specs]
        out_schema = TupleSchema(key_attrs + agg_attrs)
        out_dicts = {n: cb.dicts[n] for n in names if n in cb.dicts}
        opts = self.options
        out_cap = opts.estimated_result_row_count or cb.capacity
        if opts.max_unique_keys_in_result:
            out_cap = min(out_cap, opts.max_unique_keys_in_result)
        max_keys = opts.max_unique_keys_in_result
        distinct_inputs = {s.input for s in specs if s.distinct}
        if len(distinct_inputs) > 1:
            # Multi-column DISTINCT needs the reference's hybrid column-group
            # replication (hybrid_group_utils.h:20-66) — not yet ported.
            raise SchemaError(
                "at most one DISTINCT input column supported per aggregate")
        has_distinct = bool(distinct_inputs)

        def fn(rctx: RunContext) -> Table:
            t = cb.run(rctx)
            cap = t.capacity
            codes = group_code_columns(t, names)  # [null_rank, code] per key
            pad = (jnp.arange(cap) >= t.num_rows).astype(jnp.int32)
            rowid = jnp.arange(cap, dtype=jnp.int32)
            sort_ops = [pad] + codes
            if has_distinct:
                # extra value-order keys so DISTINCT can compare neighbors
                for s in specs:
                    if s.distinct and s.input is not None:
                        c = t.columns[s.input]
                        sort_ops.append(
                            monotone_code(c.values,
                                          t.schema.lookup(s.input).type))
                        sort_ops.append(c.valid_or_true().astype(jnp.int32))
            res = jax.lax.sort(sort_ops + [rowid],
                               num_keys=len(sort_ops), is_stable=True)
            perm = res[-1]
            s_codes = [res[i + 1] for i in range(len(codes))]
            live = jnp.arange(cap) < t.num_rows  # pads sorted last
            prev_same = jnp.ones(cap, dtype=jnp.bool_)
            for c in s_codes:
                prev_same = prev_same & (c == jnp.roll(c, 1))
            boundary = live & (~prev_same | (jnp.arange(cap) == 0))
            raw_gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
            num_groups = jnp.sum(boundary.astype(jnp.int32))
            # rank groups by first-occurrence original row id => reference
            # insertion order
            first_row = jax.ops.segment_min(
                jnp.where(live, perm, cap + 1),
                jnp.where(live, raw_gid, out_cap + cap),  # drop pads
                num_segments=cap)
            gid_arr = jnp.arange(cap, dtype=jnp.int32)
            sorted_pair = jax.lax.sort([first_row, gid_arr], num_keys=1,
                                       is_stable=True)
            rank_of = jnp.zeros(cap, dtype=jnp.int32).at[sorted_pair[1]].set(
                gid_arr)
            final_gid = jnp.take(rank_of, jnp.clip(raw_gid, 0, cap - 1))
            if max_keys is not None:
                over = final_gid >= max_keys
                final_gid = jnp.minimum(final_gid, max_keys - 1)
                num_groups = jnp.minimum(num_groups, max_keys)
            final_gid = jnp.where(live & (final_gid < out_cap),
                                  final_gid, out_cap)
            num_groups = jnp.minimum(num_groups, out_cap)

            # key columns: value at the group's first-occurrence row
            key_first = jax.ops.segment_min(
                jnp.where(live, perm, cap + 1), final_gid,
                num_segments=out_cap)
            ok = key_first <= cap
            safe = jnp.clip(key_first, 0, cap - 1)
            cols: dict[str, Column] = {}
            for n, a in zip(names, key_attrs):
                c = t.columns[n]
                kv = jnp.take(c.values, safe)
                kvalid = None
                if a.nullable:
                    kvalid = jnp.take(c.valid_or_true(), safe) & ok
                cols[n] = Column(kv, kvalid)
            cols.update(_aggregate_segments(
                t, perm, final_gid, out_cap, specs, cb.schema, s_codes))
            return Table(out_schema, cols, num_groups, out_dicts)

        return BoundOperation(out_schema, out_dicts, fn, out_cap)


class BestEffortGroupAggregate(GroupAggregate):
    """Best-effort pregroup (reference: aggregate_groups.cc:989,
    aggregate.h:233-246).  Under static HBM budgeting a full group-by always
    fits its declared capacity, so single-chip best-effort == exact; the
    partial-aggregate contract matters for the distributed pregroup ->
    shuffle -> combine pipeline (parallel/dist_ops.py), which reuses this
    op per shard."""

    best_effort = True


class ScalarAggregate(Operation):
    """Aggregate the whole input to exactly one row — even when empty
    (reference: aggregate_scalar.cc:17-58)."""

    def __init__(self, specification, child):
        if isinstance(specification, AggregationSpecification):
            self.spec = specification
        else:
            self.spec = AggregationSpecification(specification)
        self.child = child

    def bind(self, ctx: BindContext) -> BoundOperation:
        cb = self.child.bind(ctx)
        specs = self.spec.specs
        out_schema = TupleSchema([_resolve_output_attr(s, cb.schema)
                                  for s in specs])

        def fn(rctx: RunContext) -> Table:
            t = cb.run(rctx)
            cap = t.capacity
            perm = jnp.arange(cap, dtype=jnp.int32)
            seg = jnp.where(t.row_mask(), 0, 1)
            cols = _aggregate_segments(t, perm, seg, 1, specs, cb.schema, [])
            return Table(out_schema, cols, 1, {})

        return BoundOperation(out_schema, {}, fn, 1)


class AggregateClusters(Operation):
    """Streaming aggregate over key-clustered input (reference:
    aggregate_clusters.cc:338-646): group boundaries are detected by
    comparing consecutive rows; no sort, output in input cluster order."""

    def __init__(self, group_by: Sequence[str], specification, child,
                 out_capacity: Optional[int] = None):
        self.group_by = list(group_by)
        if isinstance(specification, AggregationSpecification):
            self.spec = specification
        else:
            self.spec = AggregationSpecification(specification)
        self.child = child
        self.out_capacity = out_capacity

    def bind(self, ctx: BindContext) -> BoundOperation:
        cb = self.child.bind(ctx)
        names = self.group_by
        specs = self.spec.specs
        key_attrs = [cb.schema.lookup(n) for n in names]
        agg_attrs = [_resolve_output_attr(s, cb.schema) for s in specs]
        out_schema = TupleSchema(key_attrs + agg_attrs)
        out_dicts = {n: cb.dicts[n] for n in names if n in cb.dicts}
        out_cap = self.out_capacity or cb.capacity

        def fn(rctx: RunContext) -> Table:
            t = cb.run(rctx)
            cap = t.capacity
            codes = group_code_columns(t, names)
            live = t.row_mask()
            prev_same = jnp.ones(cap, dtype=jnp.bool_)
            for c in codes:
                prev_same = prev_same & (c == jnp.roll(c, 1))
            boundary = live & (~prev_same | (jnp.arange(cap) == 0))
            gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
            num_groups = jnp.sum(boundary.astype(jnp.int32))
            gid = jnp.where(live & (gid < out_cap), gid, out_cap)
            perm = jnp.arange(cap, dtype=jnp.int32)
            first = jax.ops.segment_min(jnp.where(live, perm, cap + 1), gid,
                                        num_segments=out_cap)
            ok = first <= cap
            safe = jnp.clip(first, 0, cap - 1)
            cols = {}
            for n, a in zip(names, key_attrs):
                c = t.columns[n]
                kv = jnp.take(c.values, safe)
                kvalid = (jnp.take(c.valid_or_true(), safe) & ok
                          if a.nullable else None)
                cols[n] = Column(kv, kvalid)
            cols.update(_aggregate_segments(
                t, perm, gid, out_cap, specs, cb.schema, codes))
            return Table(out_schema, cols, jnp.minimum(num_groups, out_cap),
                         out_dicts)

        return BoundOperation(out_schema, out_dicts, fn, out_cap)
