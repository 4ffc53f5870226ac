"""Host-evaluated operations for results with no dense device encoding.

The reference's CONCAT aggregation builds variable-length strings per
group (aggregation_operators.h CONCAT: values joined with ","); strings
have no dense device representation mid-query, so the concat itself runs
on the host over the device-computed grouping.  This matches the
reference's own cost model — CONCAT is inherently a variable-length
materialization.
"""
from __future__ import annotations

from typing import Optional, Sequence

from ..batch import Table
from ..schema import Attribute, TupleSchema
from ..types import DataType
from .aggregate import AggSpec, Aggregation, GroupAggregate
from .base import Operation, execute
from .scan import ScanTable


def group_concat(table_or_plan, group_by: Sequence[str], input_col: str,
                 output: str, separator: str = ",",
                 distinct: bool = False) -> Table:
    """GROUP BY keys -> CONCAT(input) AS output (reference: Aggregation
    CONCAT, proto/supersonic.proto:69; separator "," per
    aggregation_operators.h).

    Executes the child on device, then concatenates on host in input-row
    order (the reference's append order).  Returns a host Table: keys +
    STRING concat column.
    """
    if isinstance(table_or_plan, Operation):
        src = execute(table_or_plan)
    else:
        src = table_or_plan
    cols = src.to_numpy()
    names = list(group_by)
    n = int(src.num_rows)
    order: list = []
    groups: dict = {}
    for i in range(n):
        key = tuple(cols[k][i] for k in names)
        if key not in groups:
            groups[key] = []
            order.append(key)
        v = cols[input_col][i]
        if v is None:
            continue
        s = v if isinstance(v, str) else str(v)
        if distinct and s in groups[key]:
            continue
        groups[key].append(s)

    key_attrs = [src.schema.lookup(k) for k in names]
    out_schema = TupleSchema(
        key_attrs + [Attribute(output, DataType.STRING, True)])
    data = {k: [key[i] for key in order] for i, k in enumerate(names)}
    data[output] = [separator.join(groups[key]) if groups[key] else None
                    for key in order]
    return Table.from_data(out_schema, data)


def to_string(table_or_plan, input_col: str, output: str,
              fmt: Optional[str] = None) -> Table:
    """Materialize a column as STRING (reference: ToString /
    string_bound_expressions.cc; DateFormat for DATE/DATETIME with
    ``fmt``).  Numeric -> string has no dense device encoding (the value
    space is unbounded), so this runs at host materialization: the child
    executes on device, the stringification is O(rows) host work, and the
    result is re-dictionary-encoded.  Appends ``output`` to the schema.
    """
    import datetime

    from .base import Operation, execute as _execute

    src = (_execute(table_or_plan) if isinstance(table_or_plan, Operation)
           else table_or_plan)
    attr = src.schema.lookup(input_col)
    cols = src.to_numpy()
    vals = cols[input_col]
    out_vals = []
    for v in vals:
        if v is None:
            out_vals.append(None)
        elif attr.type == DataType.DATE:
            d = datetime.date(1970, 1, 1) + datetime.timedelta(days=int(v))
            out_vals.append(d.strftime(fmt) if fmt else d.isoformat())
        elif attr.type == DataType.DATETIME:
            dt = (datetime.datetime(1970, 1, 1)
                  + datetime.timedelta(microseconds=int(v)))
            out_vals.append(dt.strftime(fmt) if fmt else dt.isoformat())
        elif isinstance(v, bool):
            out_vals.append("true" if v else "false")
        else:
            out_vals.append(str(v))
    data = {a.name: list(cols[a.name]) for a in src.schema}
    data[output] = out_vals
    out_schema = src.schema.concat(TupleSchema(
        [Attribute(output, DataType.STRING, True)]))
    return Table.from_data(out_schema, data)


DateFormat = to_string  # reference naming alias for DATE/DATETIME use


def format_number(table_or_plan, input_col: str, precision: int,
                  output: str) -> Table:
    """FORMAT(col, precision) at host materialization (reference:
    math_expressions.h:115, math_evaluators.h:39-59 "%.*f" with precision
    clamped at >= 0).  The child executes on device; rendering is O(rows)
    host work and the result column is re-dictionary-encoded."""
    src = (execute(table_or_plan) if isinstance(table_or_plan, Operation)
           else table_or_plan)
    prec = max(int(precision), 0)
    cols = src.to_numpy()
    out_vals = [None if v is None else ("%.*f" % (prec, float(v)))
                for v in cols[input_col]]
    data = {a.name: list(cols[a.name]) for a in src.schema}
    data[output] = out_vals
    out_schema = src.schema.concat(TupleSchema(
        [Attribute(output, DataType.STRING, True)]))
    return Table.from_data(out_schema, data)


def concat_columns(table_or_plan, input_cols: Sequence[str], output: str,
                   separator: str = "") -> Table:
    """Row-wise CONCAT of arbitrarily many columns at host materialization
    (reference: string_bound_expressions.cc BoundConcatExpression; output
    NULL iff any input NULL).  Fallback for exprs.Concat when the
    cross-product dictionary would exceed its size budget; non-string
    inputs are stringified like the reference's implicit ToString."""
    src = (execute(table_or_plan) if isinstance(table_or_plan, Operation)
           else table_or_plan)
    cols = src.to_numpy()
    n = int(src.num_rows)
    out_vals: list = []
    for i in range(n):
        parts = []
        for name in input_cols:
            v = cols[name][i]
            if v is None:
                parts = None
                break
            if isinstance(v, bool):
                v = "true" if v else "false"
            parts.append(v if isinstance(v, str) else str(v))
        out_vals.append(None if parts is None else separator.join(parts))
    data = {a.name: list(cols[a.name]) for a in src.schema}
    data[output] = out_vals
    out_schema = src.schema.concat(TupleSchema(
        [Attribute(output, DataType.STRING, True)]))
    return Table.from_data(out_schema, data)
