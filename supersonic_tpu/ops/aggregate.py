"""Aggregation: GroupAggregate / ScalarAggregate / AggregateClusters.

Reference: cursor/core/aggregate_groups.cc (hash group-by over a
RowHashSet, scatter-updating an Aggregator block), aggregate_scalar.cc,
aggregate_clusters.cc, column_aggregator.cc (per-column update kernels,
COUNT counts non-null, FIRST/LAST keep encounter order, DISTINCT dedups
per key).

TPU redesign (SURVEY.md §2.4, §7.2 step 4): random scatter into a hash
table is hostile to a vector machine, and even XLA's segment ops lower to
~50ms/8M-row HBM scatters.  So:

  1. ONE stable multi-operand sort moves the key codes (ops/keys.py) AND
     every needed payload column together (gathers avoided entirely).
  2. Group runs fall out of neighbor comparison; every aggregate is a
     segmented prefix scan (ops/segscan.py) read at each run's last row —
     exact for any dtype including emulated f64, any group cardinality.
  3. ONE compaction (payload sort) extracts the per-group rows, and a
     final small sort re-ranks groups by first-occurrence row so the
     output order matches the reference's insertion-order contract.

``AggregateClusters`` skips the sort and the re-rank (input already
clustered, encounter order preserved).  The best-effort/pregroup ->
shuffle -> combine algebra (aggregate.h:233-246) lives in parallel/dist.py.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..batch import Column, Table
from ..schema import Attribute, SchemaError, TupleSchema
from ..types import DataType, jnp_dtype
from .base import BindContext, BoundOperation, Operation, RunContext
from .filter import compact_by_mask
from .keys import group_code_columns, monotone_code
from .segscan import seg_carry_first, seg_cummax, seg_cummin, seg_cumsum


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
    # merge into the last kept group (aggregate_groups.cc:501-510)


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


def _normalize_spec(specification) -> AggregationSpecification:
    if isinstance(specification, AggregationSpecification):
        return specification
    return AggregationSpecification(specification)


def _scan_aggregates(specs, schema_in, sorted_cols, boundary, live_s, pos):
    """Per-sorted-row aggregate scans; values at each run's last row are
    the group results.  sorted_cols[name] -> (values, valid_or_None) in
    sorted order.  Returns {output: (values_row, valid_row_or_None)}."""
    out = {}
    reset = boundary
    for spec in specs:
        out_attr = _resolve_output_attr(spec, schema_in)
        odt = jnp_dtype(out_attr.type)
        agg = spec.aggregation
        if agg == Aggregation.COUNT and spec.input is None:
            w = live_s.astype(jnp.int64)
            out[spec.output] = (seg_cumsum(w, reset).astype(odt), None)
            continue
        vals, valid = sorted_cols[spec.input]
        valid = (jnp.ones_like(live_s) if valid is None else valid) & live_s
        weight = valid
        if spec.distinct and agg in (Aggregation.SUM, Aggregation.COUNT):
            vcode = monotone_code(vals, schema_in.lookup(spec.input).type)
            same = ((~boundary) & (vcode == jnp.roll(vcode, 1))
                    & (valid == jnp.roll(valid, 1)) & (pos > 0))
            weight = weight & ~same
        if agg == Aggregation.SUM:
            acc = jnp.where(weight, vals, jnp.zeros_like(vals)).astype(odt)
            s = seg_cumsum(acc, reset)
            nv = seg_cumsum(weight.astype(jnp.int32), reset)
            out[spec.output] = (s, nv > 0)
        elif agg == Aggregation.COUNT:
            out[spec.output] = (
                seg_cumsum(weight.astype(jnp.int64), reset).astype(odt),
                None)
        elif agg == Aggregation.MIN:
            acc = jnp.where(weight, vals, _min_identity(vals.dtype))
            m = seg_cummin(acc, reset)
            nv = seg_cumsum(weight.astype(jnp.int32), reset)
            out[spec.output] = (m.astype(odt), nv > 0)
        elif agg == Aggregation.MAX:
            acc = jnp.where(weight, vals, _max_identity(vals.dtype))
            m = seg_cummax(acc, reset)
            nv = seg_cumsum(weight.astype(jnp.int32), reset)
            out[spec.output] = (m.astype(odt), nv > 0)
        elif agg == Aggregation.FIRST:
            fvals = seg_carry_first(vals, reset)
            fvalid = seg_carry_first(valid, reset)
            out[spec.output] = (fvals.astype(odt), fvalid)
        elif agg == Aggregation.LAST:
            # at a run's last row the row's own value IS the group LAST
            out[spec.output] = (vals.astype(odt), valid)
        elif agg == Aggregation.CONCAT:
            raise NotImplementedError(
                "CONCAT aggregation runs on host — use group_concat "
                "(variable-length strings have no dense device encoding)")
        else:
            raise SchemaError(f"unknown aggregation {agg}")
    return out


def _grouped_aggregate(t: Table, names, specs, schema_in, out_dicts,
                       out_schema, out_cap, max_keys, rctx: RunContext,
                       pre_sorted: bool, rerank: bool, keep=None,
                       live_count=None):
    """Shared core of GroupAggregate (pre_sorted=False) and
    AggregateClusters (pre_sorted=True, no re-rank).  ``keep`` fuses an
    upstream Filter: kept rows only, without a separate compaction."""
    cap = t.capacity
    pos = jnp.arange(cap)
    if keep is None:
        keep = t.row_mask()
    if live_count is None:
        live_count = jnp.asarray(t.num_rows)
    key_attrs = [schema_in.lookup(n) for n in names]
    # columns whose sorted values we need
    needed = list(dict.fromkeys(
        list(names) + [s.input for s in specs if s.input is not None]))

    if pre_sorted:
        live_s = keep
        sorted_cols = {n: (t.columns[n].values, t.columns[n].valid)
                       for n in needed}
        s_codes = group_code_columns(t, list(names))
        orig_rowid = pos.astype(jnp.int32)
    else:
        codes = group_code_columns(t, list(names))
        pad = (~keep).astype(jnp.int32)
        operands = [pad] + codes
        has_distinct = any(s.distinct for s in specs)
        if has_distinct:
            seen = set()
            for s in specs:
                if s.distinct and s.input is not None and s.input not in seen:
                    seen.add(s.input)
                    c = t.columns[s.input]
                    operands.append(monotone_code(
                        c.values, schema_in.lookup(s.input).type))
                    operands.append(c.valid_or_true().astype(jnp.int32))
        payload = [pos.astype(jnp.int32)]
        layout = []
        for n in needed:
            c = t.columns[n]
            payload.append(c.values)
            if c.valid is not None:
                payload.append(c.valid)
                layout.append((n, True))
            else:
                layout.append((n, False))
        res = jax.lax.sort(operands + payload, num_keys=len(operands),
                           is_stable=True)
        s_codes = list(res[1:1 + len(codes)])
        pi = len(operands)
        orig_rowid = res[pi]
        pi += 1
        sorted_cols = {}
        for n, has_valid in layout:
            vals = res[pi]
            pi += 1
            valid = None
            if has_valid:
                valid = res[pi]
                pi += 1
            sorted_cols[n] = (vals, valid)
        live_s = pos < live_count  # pads/filtered rows sorted last

    prev_same = jnp.ones(cap, dtype=jnp.bool_)
    for c in s_codes:
        prev_same = prev_same & (c == jnp.roll(c, 1))
    boundary = live_s & (~prev_same | (pos == 0))
    num_groups = jnp.sum(boundary.astype(jnp.int32))
    is_end = live_s & (jnp.roll(boundary, -1) | (pos == live_count - 1))

    agg_rows = _scan_aggregates(specs, schema_in, sorted_cols, boundary,
                                live_s, pos)
    first_row = seg_carry_first(orig_rowid, boundary)

    # extraction: one compaction moves each run-end row's values
    ext_cap = cap if max_keys is not None else out_cap
    ext_attrs = list(key_attrs)
    for s in specs:
        ext_attrs.append(_resolve_output_attr(s, schema_in))
    ext_attrs.append(Attribute("__first", DataType.INT32, False))
    ext_schema = TupleSchema(ext_attrs)
    ext_cols: dict[str, Column] = {}
    for n in names:
        vals, valid = sorted_cols[n]
        ext_cols[n] = Column(vals, valid)
    for s in specs:
        vals, valid = agg_rows[s.output]
        ext_cols[s.output] = Column(
            vals, valid if _resolve_output_attr(s, schema_in).nullable
            else None)
    ext_cols["__first"] = Column(first_row.astype(jnp.int32), None)
    ext_t = Table(ext_schema, ext_cols, live_count, out_dicts, cap_hint=cap)
    if max_keys is None:
        rctx.error_flags.append(
            ("aggregate result overflow", num_groups > out_cap))
    compacted = compact_by_mask(ext_t, is_end, ext_cap)

    if rerank:
        from .sort import SortOrder, sort_table
        ranked = sort_table(
            Table(ext_schema, compacted.columns, num_groups, out_dicts,
                  cap_hint=ext_cap),
            SortOrder([("__first", True)]))
    else:
        ranked = compacted

    cols = {n: ranked.columns[n] for n in
            [a.name for a in key_attrs] + [s.output for s in specs]}
    n_out = jnp.minimum(num_groups, out_cap)

    if max_keys is not None:
        K = max_keys
        rank = jnp.arange(ext_cap)
        overflow = (rank >= K) & (rank < num_groups)
        merged = {}
        for s in specs:
            a = _resolve_output_attr(s, schema_in)
            c = cols[s.output]
            vals, valid = c.values, c.valid
            v_eff = vals if valid is None else jnp.where(
                valid, vals, jnp.zeros_like(vals))
            agg = s.aggregation
            if agg in (Aggregation.SUM, Aggregation.COUNT):
                extra = jnp.sum(jnp.where(overflow, v_eff,
                                          jnp.zeros_like(v_eff)))
                vals = vals.at[K - 1].add(extra)
            elif agg == Aggregation.MIN:
                tail = jnp.min(jnp.where(
                    overflow & (jnp.ones_like(overflow) if valid is None
                                else valid),
                    vals, _min_identity(vals.dtype)))
                vals = vals.at[K - 1].set(jnp.minimum(vals[K - 1], tail))
            elif agg == Aggregation.MAX:
                tail = jnp.max(jnp.where(
                    overflow & (jnp.ones_like(overflow) if valid is None
                                else valid),
                    vals, _max_identity(vals.dtype)))
                vals = vals.at[K - 1].set(jnp.maximum(vals[K - 1], tail))
            # FIRST/LAST keep the K-th group's own values
            if valid is not None and agg in (Aggregation.SUM,
                                             Aggregation.MIN,
                                             Aggregation.MAX):
                any_tail = jnp.any(overflow & valid)
                valid = valid.at[K - 1].set(valid[K - 1] | any_tail)
            merged[s.output] = Column(vals, valid)
        cols.update(merged)
        n_out = jnp.minimum(num_groups, K)

    # slice down to the declared output capacity
    if ext_cap != out_cap:
        cols = {n: Column(c.values[:out_cap],
                          None if c.valid is None else c.valid[:out_cap])
                for n, c in cols.items()}
    return Table(out_schema, cols, n_out, out_dicts, cap_hint=out_cap)


class GroupAggregate(Operation):
    """Hash group-by, TPU-style (payload sort + segmented scans).

    reference: GroupAggregate (aggregate_groups.cc:980); result ordering =
    key insertion order (RowHashSet append order), reproduced by re-ranking
    groups on first-occurrence row id.
    """

    best_effort = False

    def __init__(self, group_by: Sequence[str], specification, child,
                 options: GroupAggregateOptions | None = None):
        self.group_by = list(group_by)
        self.spec = _normalize_spec(specification)
        self.child = child
        self.options = options or GroupAggregateOptions()

    def bind(self, ctx: BindContext) -> BoundOperation:
        from .filter import bind_predicates, keep_mask, unwrap_filters
        inner, preds = unwrap_filters(self.child)
        cb = inner.bind(ctx)
        bound_preds = bind_predicates(preds, cb)
        names = self.group_by
        specs = self.spec.specs
        key_attrs = [cb.schema.lookup(n) for n in names]
        agg_attrs = [_resolve_output_attr(s, cb.schema) for s in specs]
        out_schema = TupleSchema(key_attrs + agg_attrs)
        out_dicts = {n: cb.dicts[n] for n in names if n in cb.dicts}
        opts = self.options
        out_cap = opts.estimated_result_row_count or cb.capacity
        if opts.max_unique_keys_in_result:
            out_cap = min(out_cap, opts.max_unique_keys_in_result)
        max_keys = opts.max_unique_keys_in_result
        schema_in = cb.schema
        # DISTINCT needs (key, value)-sorted rows; with multiple distinct
        # input columns the engine runs one sorted pass per distinct column
        # (the reference replicates input per column group instead —
        # hybrid_group_utils.h:20-66 — same asymptotics).
        distinct_inputs = sorted({s.input for s in specs if s.distinct})
        subsets: list[list[AggSpec]] = []
        base = [s for s in specs
                if not (s.distinct and s.input in distinct_inputs[1:])]
        subsets.append(base)
        for d in distinct_inputs[1:]:
            subsets.append([s for s in specs if s.distinct and s.input == d])

        def fn(rctx: RunContext) -> Table:
            t = cb.run(rctx)
            keep = live_count = None
            if bound_preds:
                keep = keep_mask(bound_preds, rctx, t)
                live_count = jnp.sum(keep.astype(jnp.int32))
            parts = []
            for sub in subsets:
                sub_schema = TupleSchema(
                    key_attrs + [_resolve_output_attr(s, schema_in)
                                 for s in sub])
                parts.append(_grouped_aggregate(
                    t, names, sub, schema_in, out_dicts, sub_schema,
                    out_cap, max_keys, rctx, pre_sorted=False, rerank=True,
                    keep=keep, live_count=live_count))
            first = parts[0]
            if len(parts) == 1:
                return first
            # every pass ranks groups identically (same keys, same first-
            # occurrence rows) so the agg columns align row-for-row
            cols = dict(first.columns)
            for p in parts[1:]:
                for s_name in p.schema.names():
                    if s_name not in cols:
                        cols[s_name] = p.columns[s_name]
            return Table(out_schema, cols, first.num_rows, out_dicts,
                         cap_hint=out_cap)

        return BoundOperation(out_schema, out_dicts, fn, out_cap)


class BestEffortGroupAggregate(GroupAggregate):
    """Best-effort pregroup (reference: aggregate_groups.cc:989,
    aggregate.h:233-246).  Under static HBM budgeting a full group-by
    always fits its declared capacity, so single-chip best-effort ==
    exact; the partial-aggregate contract matters for the distributed
    pregroup -> shuffle -> combine pipeline (parallel/dist.py)."""

    best_effort = True


class HybridGroupAggregate(GroupAggregate):
    """Disk-capable group-by (reference: aggregate_groups.cc:1146
    HybridGroupAggregate): pregroup -> DISTINCT column-group transform ->
    disk sort -> combine.  Under the TPU engine's static HBM budgeting
    nothing spills: the sort+scan GroupAggregate already handles arbitrary
    cardinality and multi-column DISTINCT in memory, so Hybrid is
    semantically the same operator (retained for API parity)."""


class ScalarAggregate(Operation):
    """Aggregate the whole input to exactly one row — even when empty
    (reference: aggregate_scalar.cc:17-58)."""

    def __init__(self, specification, child):
        self.spec = _normalize_spec(specification)
        self.child = child

    def bind(self, ctx: BindContext) -> BoundOperation:
        cb = self.child.bind(ctx)
        specs = self.spec.specs
        out_schema = TupleSchema([_resolve_output_attr(s, cb.schema)
                                  for s in specs])
        schema_in = cb.schema

        def fn(rctx: RunContext) -> Table:
            t = cb.run(rctx)
            live = t.row_mask()
            cols = {}
            for s in specs:
                a = _resolve_output_attr(s, schema_in)
                odt = jnp_dtype(a.type)
                agg = s.aggregation
                if agg == Aggregation.COUNT and s.input is None:
                    v = jnp.sum(live.astype(jnp.int64)).astype(odt)
                    cols[s.output] = Column(v[None], None)
                    continue
                c = t.columns[s.input]
                valid = c.valid_or_true() & live
                vals = c.values
                weight = valid
                if s.distinct and agg in (Aggregation.SUM,
                                          Aggregation.COUNT):
                    code = monotone_code(vals,
                                         schema_in.lookup(s.input).type)
                    ops_ = [jnp.where(valid, 0, 1).astype(jnp.int32), code,
                            valid.astype(jnp.int32)]
                    sc = jax.lax.sort(ops_ + [vals], num_keys=3,
                                      is_stable=True)
                    svals, scode = sc[-1], sc[1]
                    svalid = sc[2] > 0
                    dup = ((scode == jnp.roll(scode, 1))
                           & (jnp.arange(t.capacity) > 0))
                    weight = svalid & ~dup
                    vals = svals
                    valid = svalid
                if agg == Aggregation.SUM:
                    v = jnp.sum(jnp.where(weight, vals,
                                          jnp.zeros_like(vals))).astype(odt)
                    ok = jnp.any(weight)
                    cols[s.output] = Column(v[None], ok[None])
                elif agg == Aggregation.COUNT:
                    v = jnp.sum(weight.astype(jnp.int64)).astype(odt)
                    cols[s.output] = Column(v[None], None)
                elif agg == Aggregation.MIN:
                    v = jnp.min(jnp.where(weight, vals,
                                          _min_identity(vals.dtype)))
                    cols[s.output] = Column(v.astype(odt)[None],
                                            jnp.any(weight)[None])
                elif agg == Aggregation.MAX:
                    v = jnp.max(jnp.where(weight, vals,
                                          _max_identity(vals.dtype)))
                    cols[s.output] = Column(v.astype(odt)[None],
                                            jnp.any(weight)[None])
                elif agg in (Aggregation.FIRST, Aggregation.LAST):
                    c2 = t.columns[s.input]
                    n = jnp.asarray(t.num_rows)
                    if agg == Aggregation.FIRST:
                        idx = jnp.int32(0)
                    else:
                        idx = jnp.maximum(n - 1, 0).astype(jnp.int32)
                    v = jnp.take(c2.values, idx)
                    ok = jnp.take(c2.valid_or_true(), idx) & (n > 0)
                    cols[s.output] = Column(v.astype(odt)[None], ok[None])
                else:
                    raise NotImplementedError(f"scalar {agg}")
            return Table(out_schema, cols, 1, {})

        return BoundOperation(out_schema, {}, fn, 1)


class AggregateClusters(Operation):
    """Streaming aggregate over key-clustered input (reference:
    aggregate_clusters.cc:338-646): group boundaries detected by comparing
    consecutive rows; no sort, output in input cluster order."""

    def __init__(self, group_by: Sequence[str], specification, child,
                 out_capacity: Optional[int] = None):
        self.group_by = list(group_by)
        self.spec = _normalize_spec(specification)
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
        schema_in = cb.schema

        def fn(rctx: RunContext) -> Table:
            t = cb.run(rctx)
            return _grouped_aggregate(
                t, names, specs, schema_in, out_dicts, out_schema, out_cap,
                None, rctx, pre_sorted=True, rerank=False)

        return BoundOperation(out_schema, out_dicts, fn, out_cap)
