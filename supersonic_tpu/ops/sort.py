"""Sort: multi-column ORDER BY with ASC/DESC and NULL ordering.

Reference: cursor/core/sort.cc — a column-wise refinement sort producing a
``Permutation`` (sort.cc:150-322), with external merge-sort spill for
memory-bounded inputs (sort.cc:324-399).  TPU redesign (SURVEY.md §7.1):
one ``lax.sort`` over monotone key codes (ops/keys.py) with the row-id
permutation as payload; XLA lowers this to an on-chip vectorized sort.
There is no disk spill — HBM is the memory budget; cross-chip scale uses
the distributed sample-sort in parallel/ (SURVEY.md §7.2 step 7).

``ExtendedSort`` adds per-key case-insensitivity and a limit (reference:
ExtendedSortSpecification, proto/specification.proto).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..batch import Table, gather_table
from ..dictionary import transform as dict_transform
from ..schema import SchemaError
from ..types import DataType
from .base import BindContext, BoundOperation, Operation, RunContext
from .keys import key_operands


@dataclass(frozen=True)
class SortKey:
    """One ORDER BY key (reference: SortOrder entry, ordering.h:24-60)."""

    name: str
    ascending: bool = True
    case_sensitive: bool = True  # ExtendedSort only


class SortOrder:
    def __init__(self, keys: Sequence[SortKey | tuple | str]):
        norm = []
        for k in keys:
            if isinstance(k, SortKey):
                norm.append(k)
            elif isinstance(k, str):
                norm.append(SortKey(k))
            else:
                norm.append(SortKey(*k))
        self.keys: list[SortKey] = norm

    def names(self) -> list[str]:
        return [k.name for k in self.keys]

    def ascendings(self) -> list[bool]:
        return [k.ascending for k in self.keys]


def sort_permutation(table: Table, order: SortOrder) -> jnp.ndarray:
    """Row-id permutation realizing the sort (reference: SortPermutation,
    sort.cc:781).  Stable: equal keys keep input order."""
    operands, num_keys = key_operands(table, order.names(), order.ascendings())
    rowids = jnp.arange(table.capacity, dtype=jnp.int32)
    out = jax.lax.sort(operands + [rowids], num_keys=num_keys, is_stable=True)
    return out[-1]


class Sort(Operation):
    def __init__(self, order: SortOrder | Sequence, child: Operation):
        self.order = order if isinstance(order, SortOrder) else SortOrder(order)
        self.child = child

    def bind(self, ctx: BindContext) -> BoundOperation:
        cb = self.child.bind(ctx)
        for k in self.order.keys:
            cb.schema.lookup(k.name)
        order = self.order

        def fn(rctx: RunContext) -> Table:
            t = cb.run(rctx)
            perm = sort_permutation(t, order)
            return gather_table(t, perm, t.num_rows)

        return BoundOperation(cb.schema, cb.dicts, fn, cb.capacity)


class ExtendedSort(Operation):
    """Sort with optional per-key case-insensitivity and a row limit
    (reference: ExtendedSort / specification_builder.cc — implemented by
    injecting a ToLower key transform, here a dictionary remap LUT)."""

    def __init__(self, order: SortOrder | Sequence, child: Operation,
                 limit: Optional[int] = None):
        self.order = order if isinstance(order, SortOrder) else SortOrder(order)
        self.child = child
        self.limit = limit

    def bind(self, ctx: BindContext) -> BoundOperation:
        cb = self.child.bind(ctx)
        order = self.order
        # Build fold-to-lower LUTs for case-insensitive string keys.
        luts: dict[str, jnp.ndarray] = {}
        for k in order.keys:
            attr = cb.schema.lookup(k.name)
            if not k.case_sensitive:
                if attr.type not in (DataType.STRING, DataType.BINARY):
                    raise SchemaError(
                        f"case-insensitive sort key {k.name!r} must be STRING")
                d = cb.dicts[k.name]
                _, remap = dict_transform(
                    d, lambda v: v.lower() if isinstance(v, str) else v.lower())
                luts[k.name] = jnp.asarray(remap)
        limit = self.limit
        out_cap = min(cb.capacity, limit) if limit else cb.capacity

        def fn(rctx: RunContext) -> Table:
            t = cb.run(rctx)
            if luts:
                # Sort on a shadow table with folded codes; gather original.
                cols = dict(t.columns)
                for name, lut in luts.items():
                    colm = cols[name]
                    folded = jnp.take(lut, jnp.clip(colm.values, 0,
                                                    lut.shape[0] - 1))
                    cols[name] = colm._replace(values=folded)
                shadow = Table(t.schema, cols, t.num_rows, t.dicts)
                perm = sort_permutation(shadow, order)
            else:
                perm = sort_permutation(t, order)
            n = t.num_rows
            if limit is not None:
                perm = perm[:out_cap]
                n = jnp.minimum(n, limit)
            return gather_table(t, perm, n)

        return BoundOperation(cb.schema, cb.dicts, fn, out_cap)
