"""String expressions over dictionary-encoded columns.

Reference: expression/core/string_expressions.h (Length, Trim family,
ToUpper/ToLower, Substring, Concat, StringOffset, StringReplace, ...).

TPU redesign (SURVEY.md §2.5): the device sees int32 codes; per-value
string transforms run once over the *dictionary* on the host at bind
time, and evaluation is a single device gather through the resulting
remap/property LUT.  O(|dict|) host work replaces O(rows) device-hostile
byte shuffling.  Expressions whose non-constant inputs are more than one
string column (general Concat of two columns, etc.) have no dense device
encoding and raise at bind; materialize intermediate tables to re-encode
when needed.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..dictionary import Dictionary, property_lut, transform
from ..schema import Attribute
from ..types import DataType, TypeError_
from .base import (BoundExpression, EvalContext, Expression, ExprValue,
                   merge_valid, wrap)
from .terminal import Const


def _require_string(b: BoundExpression, op: str) -> Dictionary:
    if b.type not in (DataType.STRING, DataType.BINARY):
        raise TypeError_(f"{op} requires STRING input, got {b.type}")
    if b.dictionary is None:
        raise TypeError_(f"{op}: input has no bound dictionary")
    return b.dictionary


def _dict_transform_expr(op_name: str, fn: Callable[[str], str]):
    """Unary string->string op as a bind-time dictionary transform."""

    class _Op(Expression):
        def __init__(self, child, *args):
            self.child = wrap(child)
            self.args = args

        def do_bind(self, schema, dicts):
            cb = self.child.do_bind(schema, dicts)
            d = _require_string(cb, op_name)
            f = (lambda v: fn(v, *self.args)) if self.args else fn
            nd, remap = transform(d, f)
            lut = jnp.asarray(remap)

            def g(ctx: EvalContext) -> ExprValue:
                v = cb.evaluate(ctx)
                codes = jnp.take(lut, jnp.clip(v.values, 0, lut.shape[0] - 1))
                return ExprValue(codes, v.valid)

            return BoundExpression(
                Attribute(f"{op_name}({cb.name})", cb.type, cb.nullable),
                g, nd)

    _Op.__name__ = op_name.title().replace("_", "")
    return _Op


ToUpper = _dict_transform_expr("TO_UPPER", lambda s: s.upper())
ToLower = _dict_transform_expr("TO_LOWER", lambda s: s.lower())
Ltrim = _dict_transform_expr("LTRIM", lambda s: s.lstrip())
Rtrim = _dict_transform_expr("RTRIM", lambda s: s.rstrip())
Trim = _dict_transform_expr("TRIM", lambda s: s.strip())


def _property_expr(op_name: str, fn: Callable, out_type: DataType, np_dtype):
    """Unary string->scalar op as a property LUT gather."""

    class _Op(Expression):
        def __init__(self, child, *args):
            self.child = wrap(child)
            self.args = args

        def do_bind(self, schema, dicts):
            cb = self.child.do_bind(schema, dicts)
            d = _require_string(cb, op_name)
            f = (lambda v: fn(v, *self.args)) if self.args else fn
            lut = jnp.asarray(property_lut(d, f, np_dtype))

            def g(ctx: EvalContext) -> ExprValue:
                v = cb.evaluate(ctx)
                out = jnp.take(lut, jnp.clip(v.values, 0, lut.shape[0] - 1))
                return ExprValue(out, v.valid)

            return BoundExpression(
                Attribute(f"{op_name}({cb.name})", out_type, cb.nullable), g)

    _Op.__name__ = op_name.title().replace("_", "")
    return _Op


Length = _property_expr("LENGTH", lambda s: len(s), DataType.UINT32,
                        np.uint32)


def _resolve_const(expr, name: str):
    e = wrap(expr)
    if not isinstance(e, Const):
        raise TypeError_(
            f"{name} argument must be a constant (dictionary transforms "
            "are bind-time; see module docstring)")
    return e.value


class Substring(Expression):
    """SUBSTRING(str, pos[, len]) — 1-based pos like the reference; pos and
    len must be constants (bind-time dictionary transform)."""

    def __init__(self, child, pos, length=None):
        self.child = wrap(child)
        self.pos = _resolve_const(pos, "SUBSTRING pos")
        self.length = None if length is None else _resolve_const(
            length, "SUBSTRING len")

    def do_bind(self, schema, dicts):
        pos, length = self.pos, self.length

        def sub(s: str) -> str:
            # reference semantics: 1-based; negative pos counts from end
            n = len(s)
            if pos > 0:
                start = pos - 1
            elif pos < 0:
                start = max(n + pos, 0)
            else:
                return s[:0]
            end = n if length is None else min(start + max(length, 0), n)
            return s[start:end]

        return _dict_transform_expr("SUBSTRING", sub)(self.child).do_bind(
            schema, dicts)


class StringReplace(Expression):
    """STRING_REPLACE(haystack, needle, substitute) with const needle/sub."""

    def __init__(self, haystack, needle, substitute):
        self.haystack = wrap(haystack)
        self.needle = _resolve_const(needle, "STRING_REPLACE needle")
        self.substitute = _resolve_const(substitute, "STRING_REPLACE sub")

    def do_bind(self, schema, dicts):
        needle, sub = self.needle, self.substitute
        return _dict_transform_expr(
            "STRING_REPLACE", lambda s: s.replace(needle, sub)
        )(self.haystack).do_bind(schema, dicts)


class StringOffset(Expression):
    """STRING_OFFSET(haystack, const needle): 1-based position, 0 if absent
    (reference: string_expressions.h StringOffset)."""

    def __init__(self, haystack, needle):
        self.haystack = wrap(haystack)
        self.needle = _resolve_const(needle, "STRING_OFFSET needle")

    def do_bind(self, schema, dicts):
        needle = self.needle
        return _property_expr(
            "STRING_OFFSET", lambda s: s.find(needle) + 1,
            DataType.UINT32, np.uint32)(self.haystack).do_bind(schema, dicts)


class StringContains(Expression):
    def __init__(self, haystack, needle):
        self.haystack = wrap(haystack)
        self.needle = _resolve_const(needle, "STRING_CONTAINS needle")

    def do_bind(self, schema, dicts):
        needle = self.needle
        return _property_expr(
            "CONTAINS", lambda s: needle in s, DataType.BOOL, np.bool_
        )(self.haystack).do_bind(schema, dicts)


class Concat(Expression):
    """CONCAT(args...): variadic; every arg but (at most) one must be a
    constant.  Non-string constants are stringified like the reference's
    ToString (reference: string_bound_expressions.cc Concat)."""

    def __init__(self, *args):
        self.args = [wrap(a) for a in args]

    def do_bind(self, schema, dicts):
        bounds = [a.do_bind(schema, dicts) for a in self.args]
        var_idx = [i for i, b in enumerate(bounds) if not b.is_constant]
        if len(var_idx) > 1:
            raise TypeError_(
                "CONCAT of multiple non-constant strings has no dense "
                "device encoding; materialize and re-encode instead")

        def const_text(b: BoundExpression, i) -> str:
            v = self.args[i].value if isinstance(self.args[i], Const) else None
            if v is None:
                raise TypeError_("CONCAT constant argument must be Const")
            if isinstance(v, bool):
                return "true" if v else "false"
            return v if isinstance(v, str) else str(v)

        if not var_idx:
            text = "".join(const_text(b, i) for i, b in enumerate(bounds))
            return Const(text).do_bind(schema, dicts)
        vi = var_idx[0]
        prefix = "".join(const_text(b, i) for i, b in enumerate(bounds[:vi]))
        suffix = "".join(
            const_text(b, i + vi + 1) for i, b in enumerate(bounds[vi + 1:]))
        inner = self.args[vi]
        vb = bounds[vi]
        if vb.type in (DataType.STRING, DataType.BINARY):
            return _dict_transform_expr(
                "CONCAT", lambda s: prefix + s + suffix)(inner).do_bind(
                    schema, dicts)
        raise TypeError_(
            "CONCAT of a non-constant numeric column requires ToString "
            "(no dense device encoding)")
