"""Plan-sharing, spy, and debug operations.

Reference counterparts:
  * Splitter (cursor/core/splitter.h:53-330: BarrierSplitter /
    BufferedSplitter) — one input consumed by k readers.  Under a static
    compiled DAG there is no pull protocol to coordinate; sharing is
    ``SharedOperation``, which binds and runs its subtree once per
    execution and hands the same traced Table to every consumer (XLA CSE
    would deduplicate anyway; this also avoids re-binding).
  * SpyCursor / SpyPrinter (cursor/core/spy.h:30-48) — ``Spy`` reports
    each execution's row count (and optionally row data) to a listener
    through a host callback.
  * OwnershipTaker (cursor/core/ownership_taker.h) — ``TakeOwnership``
    pins arbitrary Python objects' lifetime to a plan node.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax

from ..batch import Table
from .base import BindContext, BoundOperation, Operation, RunContext


class SharedOperation(Operation):
    """Share one subtree between multiple consumers (Splitter analogue)."""

    def __init__(self, child: Operation):
        self.child = child
        self._bound_for: Optional[BindContext] = None
        self._bound: Optional[BoundOperation] = None

    def bind(self, ctx: BindContext) -> BoundOperation:
        if self._bound_for is not ctx:
            cb = self.child.bind(ctx)
            cache_key = ("shared", id(self))

            def fn(rctx: RunContext) -> Table:
                cache = getattr(rctx, "_shared_cache", None)
                if cache is None:
                    cache = {}
                    rctx._shared_cache = cache
                if cache_key not in cache:
                    cache[cache_key] = cb.run(rctx)
                return cache[cache_key]

            self._bound_for = ctx
            self._bound = BoundOperation(cb.schema, cb.dicts, fn,
                                         cb.capacity)
        return self._bound


class SpyListener:
    """reference: SpyListener (spy.h:30)."""

    def on_result(self, name: str, num_rows) -> None:  # pragma: no cover
        print(f"[spy {name}] rows={num_rows}")


class Spy(Operation):
    """Decorator reporting each execution's output row count via a host
    callback (works under jit)."""

    def __init__(self, name: str, child: Operation,
                 listener: Optional[SpyListener] = None):
        self.name = name
        self.child = child
        self.listener = listener or SpyListener()

    def bind(self, ctx: BindContext) -> BoundOperation:
        cb = self.child.bind(ctx)
        name = self.name
        listener = self.listener

        def fn(rctx: RunContext) -> Table:
            t = cb.run(rctx)
            jax.debug.callback(
                lambda n: listener.on_result(name, int(n)), t.num_rows)
            return t

        return BoundOperation(cb.schema, cb.dicts, fn, cb.capacity)


class TakeOwnership(Operation):
    """Attach arbitrary owned objects' lifetime to a plan node
    (reference: ownership_taker.h TakeOwnership)."""

    def __init__(self, child: Operation, *owned):
        self.child = child
        self._owned = owned  # kept alive by the plan reference

    def bind(self, ctx: BindContext) -> BoundOperation:
        return self.child.bind(ctx)


def format_table(table: Table, limit: int = 20) -> str:
    """Pretty-print live rows (reference: ViewPrinter,
    cursor/infrastructure/view_printer.h)."""
    names = table.schema.names()
    rows = table.to_pylist()[:limit]
    widths = [max(len(n), *(len(repr(r[i])) for r in rows)) if rows
              else len(n) for i, n in enumerate(names)]
    header = " | ".join(n.ljust(w) for n, w in zip(names, widths))
    sep = "-+-".join("-" * w for w in widths)
    body = "\n".join(
        " | ".join(repr(v).ljust(w) for v, w in zip(r, widths))
        for r in rows)
    total = int(table.num_rows)
    suffix = "" if total <= limit else f"\n... ({total - limit} more rows)"
    return f"{header}\n{sep}\n{body}{suffix}"
