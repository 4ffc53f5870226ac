"""Terminal (leaf) expressions: constants, NULL, Sequence, RandInt32.

Reference: expression/infrastructure/terminal_expressions.h:36-71 and the
typed const factories in expression/core/.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dictionary import Dictionary
from ..schema import Attribute
from ..types import DataType, jnp_dtype
from .base import BoundExpression, EvalContext, Expression, ExprValue


def _infer_type(value) -> DataType:
    if isinstance(value, bool):
        return DataType.BOOL
    if isinstance(value, int):
        return DataType.INT32 if -(2**31) <= value < 2**31 else DataType.INT64
    if isinstance(value, float):
        return DataType.DOUBLE
    if isinstance(value, str):
        return DataType.STRING
    if isinstance(value, bytes):
        return DataType.BINARY
    raise TypeError(f"cannot infer DataType for {value!r}")


class Const(Expression):
    def __init__(self, value, type_: DataType | None = None):
        self.value = value
        self.type_ = type_ or _infer_type(value)

    def do_bind(self, schema, dicts):
        t = self.type_
        cap_dtype = jnp_dtype(t)
        dictionary = None
        if t in (DataType.STRING, DataType.BINARY):
            dictionary = Dictionary((self.value,))
            raw = 0
        elif t == DataType.BOOL:
            raw = bool(self.value)
        else:
            raw = self.value

        def fn(ctx: EvalContext) -> ExprValue:
            cap = ctx.table.capacity
            return ExprValue(jnp.full(cap, raw, dtype=cap_dtype), None)

        return BoundExpression(
            Attribute(str(self.value), t, nullable=False),
            fn, dictionary, is_constant=True,
        )


def ConstInt32(v):  return Const(v, DataType.INT32)
def ConstInt64(v):  return Const(v, DataType.INT64)
def ConstUint32(v): return Const(v, DataType.UINT32)
def ConstUint64(v): return Const(v, DataType.UINT64)
def ConstFloat(v):  return Const(v, DataType.FLOAT)
def ConstDouble(v): return Const(v, DataType.DOUBLE)
def ConstBool(v):   return Const(v, DataType.BOOL)
def ConstString(v): return Const(v, DataType.STRING)
def ConstDate(v):   return Const(v, DataType.DATE)
def ConstDateTime(v): return Const(v, DataType.DATETIME)


class Null(Expression):
    """Typed all-NULL column (reference: terminal_expressions.h Null)."""

    def __init__(self, type_: DataType):
        self.type_ = type_

    def do_bind(self, schema, dicts):
        t = self.type_

        def fn(ctx: EvalContext) -> ExprValue:
            cap = ctx.table.capacity
            return ExprValue(
                jnp.zeros(cap, dtype=jnp_dtype(t)),
                jnp.zeros(cap, dtype=jnp.bool_),
            )

        dictionary = Dictionary(()) if t in (DataType.STRING, DataType.BINARY) else None
        return BoundExpression(Attribute("NULL", t, nullable=True), fn, dictionary)


class Sequence(Expression):
    """0, 1, 2, ... per row (reference: terminal_expressions.h:58)."""

    def do_bind(self, schema, dicts):
        def fn(ctx: EvalContext) -> ExprValue:
            cap = ctx.table.capacity
            return ExprValue(jnp.arange(cap, dtype=jnp.int64), None)

        return BoundExpression(Attribute("SEQUENCE", DataType.INT64, False), fn)


class RandInt32(Expression):
    """Pseudo-random int32 per row (reference: terminal_expressions.h:66).

    Deterministic per (seed, row index) via threefry — the reference uses
    MTRandom; only the distribution contract matters, not the stream.
    """

    def __init__(self, seed: int = 0):
        self.seed = seed

    def do_bind(self, schema, dicts):
        seed = self.seed

        def fn(ctx: EvalContext) -> ExprValue:
            cap = ctx.table.capacity
            key = jax.random.PRNGKey(seed)
            bits = jax.random.randint(
                key, (cap,), minval=0, maxval=jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32,
            )
            return ExprValue(bits, None)

        return BoundExpression(Attribute("RANDINT32", DataType.INT32, False), fn)


def ConstBinary(v):
    """reference: terminal_expressions.h ConstBinary."""
    return Const(v, DataType.BINARY)


def ConstDataType(v):
    """A DATA_TYPE-valued constant (reference: terminal_expressions.h;
    the 13th DataType — stored as its enum code)."""
    from ..types import DataType as _DT

    code = list(_DT).index(v) if isinstance(v, _DT) else int(v)
    return Const(code, DataType.DATA_TYPE)


def TypedConst(type_: DataType, value):
    """reference: terminal_expressions.h TypedConst<type>(value)."""
    return Const(value, type_)
