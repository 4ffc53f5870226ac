"""Coalesce: column-wise zip of N children (reference:
cursor/core/coalesce.cc:50 — schemas concatenated, duplicate names
rejected, children driven in lockstep)."""
from __future__ import annotations

import jax.numpy as jnp

from ..batch import Table
from .base import BindContext, BoundOperation, Operation, RunContext


class Coalesce(Operation):
    def __init__(self, *children: Operation):
        self.children = list(children)

    def bind(self, ctx: BindContext) -> BoundOperation:
        cbs = [c.bind(ctx) for c in self.children]
        schema = cbs[0].schema
        for cb in cbs[1:]:
            schema = schema.concat(cb.schema)  # raises on duplicate names
        dicts = {}
        for cb in cbs:
            dicts.update(cb.dicts)
        cap = max(cb.capacity for cb in cbs)

        def fn(rctx: RunContext) -> Table:
            tables = [cb.run(rctx) for cb in cbs]
            n = tables[0].num_rows
            for t in tables[1:]:
                n = jnp.minimum(n, t.num_rows)
            cols = {}
            for t in tables:
                for name in t.schema.names():
                    col = t.columns[name]
                    if col.capacity < cap:
                        pad = cap - col.capacity
                        vals = jnp.concatenate(
                            [col.values, jnp.zeros(pad, col.values.dtype)])
                        valid = (None if col.valid is None else jnp.concatenate(
                            [col.valid, jnp.zeros(pad, jnp.bool_)]))
                        from ..batch import Column
                        col = Column(vals, valid)
                    cols[name] = col
            return Table(schema, cols, n, dicts, cap_hint=cap)

        return BoundOperation(schema, dicts, fn, cap)
