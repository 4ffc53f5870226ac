"""Filter: BOOL predicate -> compacted survivors.

Reference: cursor/core/filter.cc:65-230 — evaluate predicate (NULL counts
as false, filter.cc:169-198), build a selection row-id list, gather
surviving rows.  TPU redesign: the selection vector is produced by a
stable compaction (cumsum prefix under the hood of ``jnp.nonzero`` with a
static ``size``), and the gather is a dense ``jnp.take`` — no branchy row
loop.  A Pallas two-pass kernel backs the same contract for the hot path
(supersonic_tpu/kernels/compaction.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..batch import Table, gather_table
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
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    iota = jnp.arange(cap, dtype=jnp.int32)
    scatter_idx = jnp.where(mask & (pos < out_capacity), pos, out_capacity)
    idx = jnp.full(out_capacity, cap, dtype=jnp.int32).at[scatter_idx].set(
        iota, mode="drop")
    count = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), out_capacity)
    return idx, count


def compact_by_mask(table: Table, mask: jnp.ndarray,
                    out_capacity: int | None = None) -> Table:
    """Gather rows where mask is True into a dense prefix."""
    out_cap = out_capacity or table.capacity
    idx, count = compaction_indices(mask, out_cap)
    if len(table.schema) == 0:
        return Table(table.schema, {}, count, dict(table.dicts),
                     cap_hint=out_cap)
    return gather_table(table, idx, count)


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

        return BoundOperation(cb.schema, cb.dicts, fn, out_cap)
