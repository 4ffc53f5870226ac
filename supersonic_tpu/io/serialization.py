"""Expression deserialization from a proto-like dict/JSON description.

Reference: serialization/build_expression_from_proto.cc:754
(``BuildExpressionFromProto``) over utils/proto/expressions.proto: an
``ExpressionDescription`` is one of CONSTANT / VARIABLE / OPERATION /
FUNCTION_CALL; operations name an ``OperatorId`` from
expression/proto/operators.proto and carry child descriptions.

Here the wire form is a plain dict (JSON-compatible):

    {"constant": {"type": "INT64", "value": 5}}
    {"variable": "col_name"}
    {"operation": {"id": "ADD", "args": [<desc>, <desc>]}}

covering the reference catalog: arithmetic, comparison, logic, control
(CASE/IF/IN/IF_NULL/IS_NULL), casts, math, string, date, stateful.
"""
from __future__ import annotations

from typing import Any

from .. import exprs as E
from ..exprs.base import Expression
from ..types import DataType


class SerializationError(Exception):
    pass


def _const(desc: dict) -> Expression:
    t = DataType(desc["type"])
    if "value" not in desc or desc["value"] is None:
        return E.Null(t)
    return E.Const(desc["value"], t)


# OperatorId -> factory. Names follow expression/proto/operators.proto.
_OPERATORS: dict[str, Any] = {
    # arithmetic
    "ADD": E.Plus, "SUBTRACT": E.Minus, "MULTIPLY": E.Multiply,
    "DIVIDE_SIGNALING": E.DivideSignaling, "DIVIDE_NULLING": E.DivideNulling,
    "DIVIDE_QUIET": E.DivideQuiet,
    "CPP_DIVIDE_SIGNALING": E.CppDivideSignaling,
    "CPP_DIVIDE_NULLING": E.CppDivideNulling,
    "MODULUS_SIGNALING": E.ModulusSignaling,
    "MODULUS_NULLING": E.ModulusNulling,
    "NEGATE": E.Negate,
    # comparison
    "EQUAL": E.Equal, "NOT_EQUAL": E.NotEqual, "LESS": E.Less,
    "LESS_OR_EQUAL": E.LessOrEqual, "GREATER": E.Greater,
    "GREATER_OR_EQUAL": E.GreaterOrEqual, "IN": E.In,
    "IS_ODD": E.IsOdd, "IS_EVEN": E.IsEven,
    # logic
    "AND": E.And, "OR": E.Or, "AND_NOT": E.AndNot, "XOR": E.Xor,
    "NOT": E.Not,
    "BITWISE_AND": E.BitwiseAnd, "BITWISE_OR": E.BitwiseOr,
    "BITWISE_XOR": E.BitwiseXor, "BITWISE_NOT": E.BitwiseNot,
    "SHIFT_LEFT": E.ShiftLeft, "SHIFT_RIGHT": E.ShiftRight,
    # control
    "IF": E.If, "NULLING_IF": E.NullingIf, "CASE": E.Case,
    "IF_NULL": E.IfNull, "IS_NULL": E.IsNull,
    # math
    "EXP": E.Exp, "LN": E.Ln, "LOG10": E.Log10, "LOG2": E.Log2,
    "LOG": E.Log, "POWER": E.Pow, "SQRT_SIGNALING": E.SqrtSignaling,
    "SQRT_NULLING": E.SqrtNulling, "SQRT_QUIET": E.Sqrt,
    "ROUND": E.Round, "ROUND_TO_INT": E.RoundToInt, "CEIL": E.Ceil,
    "FLOOR": E.Floor, "TRUNC": E.Trunc, "ABS": E.Abs,
    "IS_NAN": E.IsNaN, "IS_INF": E.IsInf, "IS_FINITE": E.IsFinite,
    "IS_NORMAL": E.IsNormal,
    "SIN": E.Sin, "COS": E.Cos, "TAN": E.Tan, "ASIN": E.Asin,
    "ACOS": E.Acos, "ATAN": E.Atan, "SINH": E.Sinh, "COSH": E.Cosh,
    "TANH": E.Tanh, "ASINH": E.Asinh, "ACOSH": E.Acosh, "ATANH": E.Atanh,
    # string
    "LENGTH": E.Length, "LTRIM": E.Ltrim, "RTRIM": E.Rtrim, "TRIM": E.Trim,
    "TO_UPPER": E.ToUpper, "TO_LOWER": E.ToLower, "SUBSTRING": E.Substring,
    "CONCATENATE": E.Concat, "STRING_OFFSET": E.StringOffset,
    "STRING_REPLACE": E.StringReplace,
    # date
    "UNIXTIMESTAMP": E.UnixTimestamp, "FROMUNIXTIME": E.FromUnixTime,
    "MAKEDATE": E.MakeDate, "MAKEDATETIME": E.MakeDatetime,
    "YEAR": E.Year, "QUARTER": E.Quarter, "MONTH": E.Month, "DAY": E.Day,
    "WEEKDAY": E.Weekday, "YEARDAY": E.YearDay, "HOUR": E.Hour,
    "MINUTE": E.Minute, "SECOND": E.Second, "MICROSECOND": E.Microsecond,
    "YEAR_LOCAL": E.YearLocal, "QUARTER_LOCAL": E.QuarterLocal,
    "MONTH_LOCAL": E.MonthLocal, "DAY_LOCAL": E.DayLocal,
    "WEEKDAY_LOCAL": E.WeekdayLocal, "YEARDAY_LOCAL": E.YearDayLocal,
    "HOUR_LOCAL": E.HourLocal, "MINUTE_LOCAL": E.MinuteLocal,
    "SECOND_LOCAL": E.SecondLocal,
    "ADD_DAY": E.AddDays, "ADD_MONTH": E.AddMonths,
    "ADD_MINUTE": E.AddMinutes,
    # stateful
    "CHANGED": E.Changed, "RUNNING_SUM": E.RunningSum, "SMUDGE": E.Smudge,
    "SMUDGE_IF": E.SmudgeIf, "RUNNING_MIN_WITH_FLUSH": E.RunningMinWithFlush,
}


def build_expression(desc: dict) -> Expression:
    """Dict description -> Expression (the BuildExpressionFromProto
    equivalent)."""
    if not isinstance(desc, dict) or len(desc) != 1:
        raise SerializationError(f"bad expression description: {desc!r}")
    kind, body = next(iter(desc.items()))
    if kind == "constant":
        return _const(body)
    if kind == "variable":
        return E.col(body)
    if kind == "operation":
        op_id = body["id"].upper()
        if op_id == "CAST":
            [child] = body["args"]
            return E.CastTo(DataType(body["to_type"]),
                            build_expression(child))
        if op_id not in _OPERATORS:
            raise SerializationError(f"unknown operator {op_id!r}")
        args = [build_expression(a) for a in body.get("args", [])]
        return _OPERATORS[op_id](*args)
    raise SerializationError(f"unknown description kind {kind!r}")


def build_expression_from_json(text: str) -> Expression:
    import json

    return build_expression(json.loads(text))


def build_sort_order(desc: list):
    """[{"column": "a", "ascending": true, "case_sensitive": true}, ...]
    -> SortOrder (reference: ExtendedSortSpecification,
    proto/specification.proto + specification_builder.cc)."""
    from ..ops.sort import SortKey, SortOrder

    keys = []
    for d in desc:
        keys.append(SortKey(d["column"], d.get("ascending", True),
                            d.get("case_sensitive", True)))
    return SortOrder(keys)


def build_aggregation(desc: list):
    """[{"aggregation": "SUM", "input": "v", "output": "sv",
        "distinct": false, "output_type": "DOUBLE"}, ...]
    -> AggregationSpecification (reference: AggregationSpecification
    proto usage in benchmark/examples)."""
    from ..ops.aggregate import (AggregationSpecification, AggSpec,
                                 Aggregation)

    spec = AggregationSpecification()
    for d in desc:
        spec.add(AggSpec(
            Aggregation[d["aggregation"].upper()], d.get("input"),
            d["output"],
            DataType(d["output_type"]) if d.get("output_type") else None,
            bool(d.get("distinct", False))))
    return spec
