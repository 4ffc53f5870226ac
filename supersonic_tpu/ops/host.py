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
