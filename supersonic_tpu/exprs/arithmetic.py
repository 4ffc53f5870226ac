"""Arithmetic expressions (reference: expression/core/arithmetic_expressions.h).

Division/modulus come in three error policies (reference naming):
  * Signaling — a division by zero fails the evaluation (device error flag,
    checked at host sync).
  * Nulling   — offending rows become NULL.
  * Quiet     — offending rows hold garbage (but computation is safe).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..schema import Attribute
from ..types import DataType, common_numeric_type, is_integer, jnp_dtype
from .base import (BoundExpression, EvalContext, Expression, ExprValue,
                   expr_name, merge_valid, wrap)


class _BinaryNumeric(Expression):
    op_name = "?"
    result_type_fn: Callable | None = None  # (common) -> result type

    def __init__(self, left, right):
        self.left = wrap(left)
        self.right = wrap(right)

    def compute(self, a: jnp.ndarray, b: jnp.ndarray, ctx: EvalContext,
                valid, result_type: DataType):
        """Returns (values, extra_valid_or_None)."""
        raise NotImplementedError

    def do_bind(self, schema, dicts):
        lb = self.left.do_bind(schema, dicts)
        rb = self.right.do_bind(schema, dicts)
        common = common_numeric_type(lb.type, rb.type)
        result_type = (self.result_type_fn(common)
                       if self.result_type_fn else common)
        name = expr_name(self.op_name, [lb, rb])
        outer = self

        def fn(ctx: EvalContext) -> ExprValue:
            lv = lb.evaluate(ctx)
            rv = rb.evaluate(ctx)
            a = lv.values.astype(jnp_dtype(result_type) if outer.result_type_fn
                                 else jnp_dtype(common))
            b = rv.values.astype(a.dtype)
            valid = merge_valid(lv.valid, rv.valid)
            values, extra_valid = outer.compute(a, b, ctx, valid, result_type)
            return ExprValue(values, merge_valid(valid, extra_valid))

        nullable = lb.nullable or rb.nullable or self._adds_nulls()
        return BoundExpression(Attribute(name, result_type, nullable), fn)

    def _adds_nulls(self) -> bool:
        return False


class Plus(_BinaryNumeric):
    op_name = "ADD"
    def compute(self, a, b, ctx, valid, rt):
        return a + b, None


class Minus(_BinaryNumeric):
    op_name = "SUBTRACT"
    def compute(self, a, b, ctx, valid, rt):
        return a - b, None


class Multiply(_BinaryNumeric):
    op_name = "MULTIPLY"
    def compute(self, a, b, ctx, valid, rt):
        return a * b, None


def _to_double(_common: DataType) -> DataType:
    return DataType.DOUBLE


class DivideSignaling(_BinaryNumeric):
    """Real division -> DOUBLE; fails on divisor == 0 (reference:
    DIVIDE_SIGNALING)."""
    op_name = "DIVIDE_SIGNALING"
    result_type_fn = staticmethod(_to_double)

    def compute(self, a, b, ctx, valid, rt):
        zero = (b == 0)
        bad = zero if valid is None else (zero & valid)
        ctx.flag_error("division by zero", bad)
        return a / jnp.where(zero, 1.0, b), None


class DivideNulling(_BinaryNumeric):
    op_name = "DIVIDE_NULLING"
    result_type_fn = staticmethod(_to_double)

    def compute(self, a, b, ctx, valid, rt):
        zero = (b == 0)
        return a / jnp.where(zero, 1.0, b), ~zero

    def _adds_nulls(self):
        return True


class DivideQuiet(_BinaryNumeric):
    op_name = "DIVIDE_QUIET"
    result_type_fn = staticmethod(_to_double)

    def compute(self, a, b, ctx, valid, rt):
        return a / b, None  # float division: inf/nan are the 'garbage'


class _IntSafeDiv:
    @staticmethod
    def div(a, b, integer: bool):
        if integer:
            zero = (b == 0)
            safe = jnp.where(zero, 1, b)
            q = jnp.where(zero, 0, a // safe)
            # C++ truncates toward zero; jnp floors. They differ (by one,
            # toward zero) when operand signs differ and remainder != 0.
            r = a - q * safe
            trunc_fix = (r != 0) & ((a < 0) != (safe < 0))
            return jnp.where(trunc_fix, q + 1, q), zero
        zero = (b == 0)
        return a / jnp.where(zero, 1.0, b), zero


class CppDivideSignaling(_BinaryNumeric):
    """C++ '/' semantics: integer division on ints (reference: CPP_DIVIDE)."""
    op_name = "CPP_DIVIDE_SIGNALING"

    def compute(self, a, b, ctx, valid, rt):
        q, zero = _IntSafeDiv.div(a, b, is_integer(rt))
        bad = zero if valid is None else (zero & valid)
        ctx.flag_error("division by zero", bad)
        return q, None


class CppDivideNulling(_BinaryNumeric):
    op_name = "CPP_DIVIDE_NULLING"

    def compute(self, a, b, ctx, valid, rt):
        q, zero = _IntSafeDiv.div(a, b, is_integer(rt))
        return q, ~zero

    def _adds_nulls(self):
        return True


class ModulusSignaling(_BinaryNumeric):
    """C++ '%' (truncated) modulus (reference: MODULUS_SIGNALING)."""
    op_name = "MODULUS_SIGNALING"

    def compute(self, a, b, ctx, valid, rt):
        zero = (b == 0)
        safe = jnp.where(zero, 1, b)
        q, _ = _IntSafeDiv.div(a, safe, True)
        bad = zero if valid is None else (zero & valid)
        ctx.flag_error("modulus by zero", bad)
        return a - q * safe, None


class ModulusNulling(_BinaryNumeric):
    op_name = "MODULUS_NULLING"

    def compute(self, a, b, ctx, valid, rt):
        zero = (b == 0)
        safe = jnp.where(zero, 1, b)
        q, _ = _IntSafeDiv.div(a, safe, True)
        return a - q * safe, ~zero

    def _adds_nulls(self):
        return True


# Default aliases matching the reference's default policy choices.
Divide = DivideSignaling
CppDivide = CppDivideSignaling
Modulus = ModulusSignaling


class Negate(Expression):
    def __init__(self, child):
        self.child = wrap(child)

    def do_bind(self, schema, dicts):
        cb = self.child.do_bind(schema, dicts)
        t = cb.type
        if t in (DataType.UINT32, DataType.UINT64):
            t = DataType.INT64 if t == DataType.UINT64 else DataType.INT64

        def fn(ctx: EvalContext) -> ExprValue:
            v = cb.evaluate(ctx)
            return ExprValue(-(v.values.astype(jnp_dtype(t))), v.valid)

        return BoundExpression(Attribute(f"NEGATE({cb.name})", t, cb.nullable), fn)


CppDivideQuiet = CppDivide  # reference: OPERATOR_CPP_DIVIDE_QUIET
