"""Generate: N rows, zero columns (reference: cursor/core/generate.cc:53).
Pair with Compute(Sequence()/RandInt32()) to synthesize data on device.
"""
from __future__ import annotations

from ..batch import Table
from ..schema import TupleSchema
from .base import BindContext, BoundOperation, Operation, RunContext


class Generate(Operation):
    def __init__(self, count: int):
        self.count = count

    def bind(self, ctx: BindContext) -> BoundOperation:
        schema = TupleSchema(())
        count = self.count

        def fn(rctx: RunContext) -> Table:
            return Table(schema, {}, count, {}, cap_hint=max(count, 1))

        return BoundOperation(schema, {}, fn, max(count, 1))
