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


def resolve_deferred(entries, aux_values, cancel=None) -> None:
    """Resolve deferred dictionaries after a device run
    (ops/base.py::execute).  ``entries`` are DeferredConcat /
    DeferredRender records captured at trace time; ``aux_values`` the
    realized aux arrays.  ``cancel``: per-entry cooperative-cancellation
    poll point (Cursor::Interrupt analogue)."""
    for m, aux in zip(entries, aux_values):
        if cancel is not None:
            cancel.check()
        if hasattr(m, "kind"):
            _assemble_render(m, aux)
        else:
            _assemble_concat(m, aux)


def _assemble_render(m, aux) -> None:
    """Per-row string rendering for a DeferredRender entry (ToString /
    Format / DateFormat of unbounded numerics).  Row i's string becomes
    dictionary entry i (the device column carries row-position codes);
    rows with ok=False (dead or NULL) render as ""."""
    import time as _time

    import numpy as np

    vals = np.asarray(aux["vals"])
    ok = np.asarray(aux["ok"]).astype(bool)
    n = vals.shape[0]
    strings = [""] * n
    if m.kind == "tostring":
        for i in np.flatnonzero(ok):
            strings[i] = _ref_print(vals[i], m.input_type)
    elif m.kind == "format":
        prec = max(int(m.precision), 0)
        for i in np.flatnonzero(ok):
            strings[i] = "%.*f" % (prec, float(vals[i]))
    else:  # dateformat: strftime of gmtime, reference 33-byte buffer --
        # renderings over 32 chars become "" (date_evaluators.cc:227-265);
        # DATETIME micros truncate toward zero like C++ int division
        fmt = m.fmt
        for i in np.flatnonzero(ok):
            v = int(vals[i])
            if m.input_type == DataType.DATE:
                secs = v * 86400
            else:
                secs = v // 1000000 if v >= 0 else -((-v) // 1000000)
            try:
                s = _time.strftime(fmt, _time.gmtime(secs))
            except (OverflowError, OSError, ValueError):
                s = "NULL"
            strings[i] = s if len(s) <= 32 else ""
    m.dict_obj.resolve(strings)


def _fmt_float(v) -> str:
    """FloatToBuffer (utils/strings/numbers.cc:1273-1297): "%.6g", retried
    at "%.8g" when the printed form does not parse back to the same
    float32.  C's varargs promote the float to double before snprintf, so
    formatting the widened Python float is bit-identical."""
    import numpy as np

    f = np.float32(v)
    s = "%.6g" % float(f)
    try:
        ok = np.float32(s) == f
    except ValueError:
        ok = False
    return s if ok else ("%.8g" % float(f))


def _fmt_double(v) -> str:
    """DoubleToBuffer (utils/strings/numbers.cc:1249-1271): "%.15g",
    retried at "%.17g" when strtod does not round-trip."""
    d = float(v)
    s = "%.15g" % d
    try:
        ok = float(s) == d
    except ValueError:
        ok = False
    return s if ok else ("%.17g" % d)


def _ref_print(v, type_: DataType) -> str:
    """Reference PrintTyped formats (types_infrastructure.cc:45-130):
    ints decimal, BOOL TRUE/FALSE, DATE %Y/%m/%d, DATETIME
    %Y/%m/%d-%H:%M:%S (micros truncated toward zero like C++ int
    division, "NULL" when strftime fails on out-of-range time_t —
    types_infrastructure.cc:92-114), floats shortest round-trip
    (SimpleFtoa/SimpleDtoa), ENUM printed as its int code
    (types_infrastructure.cc:79-83)."""
    import datetime

    if type_ == DataType.BOOL:
        return "TRUE" if v else "FALSE"
    if type_ == DataType.DATE:
        try:
            d = datetime.date(1970, 1, 1) + datetime.timedelta(days=int(v))
        except OverflowError:
            return "NULL"
        return d.strftime("%Y/%m/%d")
    if type_ == DataType.DATETIME:
        # C++: time_t time = value / 1000000 — truncation toward zero,
        # NOT floor (differs for negative values not on a second boundary)
        usec = int(v)
        secs = usec // 1000000 if usec >= 0 else -((-usec) // 1000000)
        try:
            dt = (datetime.datetime(1970, 1, 1)
                  + datetime.timedelta(seconds=secs))
        except OverflowError:
            return "NULL"
        return dt.strftime("%Y/%m/%d-%H:%M:%S")
    if type_ == DataType.FLOAT:
        return _fmt_float(v)
    if type_ == DataType.DOUBLE:
        return _fmt_double(v)
    return str(int(v))


def _assemble_concat(m, aux) -> None:
    """Per-group string assembly for one CONCAT aggregate (reference:
    AggregationOperator<CONCAT> loop, aggregation_operators.h:235-283 —
    "," separator, NULL inputs skipped, values via PrintTyped).  Rows in
    ``aux`` arrive group-clustered (gid non-decreasing) with in-group
    rows in input order; invalid/dead rows are excluded by ``valid``."""
    import numpy as np

    from .. import native

    gid = np.asarray(aux["gid"])
    vals = np.asarray(aux["vals"])
    valid = np.asarray(aux["valid"]).astype(bool)
    ng = max(int(np.asarray(aux["num_groups"])), 0)
    if ng == 0:
        m.dict_obj.resolve(())
        return

    if m.input_dict is not None:
        dvals = m.input_dict.values  # STRING: str values; BINARY: bytes
        payloads = ([v if isinstance(v, bytes) else str(v).encode()
                     for v in dvals] or [b""])
        codes = np.clip(vals.astype(np.int32), 0, len(payloads) - 1)
    else:
        uniq, inv = np.unique(vals, return_inverse=True)
        payloads = [_ref_print(u, m.input_type).encode()
                    for u in uniq] or [b""]
        codes = inv.astype(np.int32).reshape(-1)

    # group start offsets over the clustered rows: dead rows carry the
    # last live gid but valid=False, so they contribute nothing
    starts_full = np.concatenate([
        np.searchsorted(gid, np.arange(ng)),
        np.array([len(gid)], dtype=np.int64)]).astype(np.int64)

    res = None
    if native.available():
        lengths = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                              count=len(payloads))
        offsets = np.zeros(len(payloads) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        res = native.concat_groups(b"".join(payloads), offsets, codes,
                                   valid, starts_full, m.separator.encode(),
                                   m.distinct)
    if res is not None:
        blob, lens = res
        out_off = np.zeros(ng + 1, dtype=np.int64)
        np.cumsum(np.maximum(lens, 0), out=out_off[1:])
        strings = ["" if lens[i] < 0
                   else blob[out_off[i]:out_off[i + 1]].decode(
                       errors="surrogateescape")
                   for i in range(ng)]
    else:
        sep = m.separator.encode()
        strings = []
        for g in range(ng):
            parts = []
            seen = set()
            for r in range(int(starts_full[g]), int(starts_full[g + 1])):
                if not valid[r]:
                    continue
                c = int(codes[r])
                if m.distinct:
                    if c in seen:
                        continue
                    seen.add(c)
                parts.append(payloads[c])
            strings.append(sep.join(parts).decode(errors="surrogateescape"))
    m.dict_obj.resolve(strings)


def group_concat(table_or_plan, group_by: Sequence[str], input_col: str,
                 output: str, separator: str = ",",
                 distinct: bool = False) -> Table:
    """GROUP BY keys -> CONCAT(input) AS output (reference: Aggregation
    CONCAT, proto/supersonic.proto:69; separator "," per
    aggregation_operators.h).

    The grouping runs on DEVICE (stable sort by the group keys, so rows
    stay in input order within each group — the reference's append
    order); the variable-length byte assembly runs in the native C++
    kernel (native/fastcol.cpp::concat_groups), one linear pass.  Only
    the per-group result decode is Python (O(groups)).  Falls back to a
    pure-Python path without the native library.  Returns a host Table:
    keys + STRING concat column, groups in first-appearance order.
    """
    if isinstance(table_or_plan, Operation):
        src = execute(table_or_plan)
    else:
        src = table_or_plan
    names = list(group_by)
    fast = _group_concat_fast(src, names, input_col, output, separator,
                              distinct)
    if fast is not None:
        return fast
    cols = src.to_numpy()
    n = int(src.num_rows)
    in_type = src.schema.lookup(input_col).type
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
        s = v if isinstance(v, str) else _ref_print(v, in_type)
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


def _group_concat_fast(src: Table, names: Sequence[str], input_col: str,
                       output: str, separator: str,
                       distinct: bool) -> Optional[Table]:
    """Device sort + native byte assembly path of group_concat."""
    import numpy as np

    from .. import native
    from .scan import ScanTable
    from .sort import Sort

    if not native.available():
        return None
    n = int(src.num_rows)
    key_attrs = [src.schema.lookup(k) for k in names]
    out_schema = TupleSchema(
        key_attrs + [Attribute(output, DataType.STRING, True)])
    if n == 0:
        return Table.from_data(out_schema,
                               {a.name: [] for a in out_schema})
    srt = execute(Sort(names, ScanTable(src)))  # stable: input order kept
    kvals = {k: np.asarray(srt.columns[k].values)[:n] for k in names}
    kvalid = {k: (None if srt.columns[k].valid is None
                  else np.asarray(srt.columns[k].valid)[:n])
              for k in names}
    boundary = np.zeros(n, dtype=bool)
    boundary[0] = True
    for k in names:
        v = kvals[k]
        boundary[1:] |= v[1:] != v[:-1]
        if kvalid[k] is not None:
            boundary[1:] |= kvalid[k][1:] != kvalid[k][:-1]
    group_starts = np.flatnonzero(boundary)
    g = len(group_starts)
    starts_full = np.concatenate(
        [group_starts, np.array([n], dtype=np.int64)]).astype(np.int64)

    c = srt.columns[input_col]
    vals = np.asarray(c.values)[:n]
    valid = None if c.valid is None else np.asarray(c.valid)[:n]
    if input_col in srt.dicts:
        d = srt.dicts[input_col]
        binary = (src.schema.lookup(input_col).type == DataType.BINARY)
        payloads = [v if binary else v.encode() for v in d.values] or [b""]
        codes = np.clip(vals.astype(np.int32), 0, len(payloads) - 1)
    else:
        in_type = src.schema.lookup(input_col).type
        uniq, inv = np.unique(vals, return_inverse=True)
        payloads = [_ref_print(u, in_type).encode() for u in uniq] or [b""]
        codes = inv.astype(np.int32)
    lengths = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                          count=len(payloads))
    offsets = np.zeros(len(payloads) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    res = native.concat_groups(b"".join(payloads), offsets, codes, valid,
                               starts_full, separator.encode(), distinct)
    if res is None:
        return None
    blob, lens = res
    out_off = np.zeros(g + 1, dtype=np.int64)
    np.cumsum(np.maximum(lens, 0), out=out_off[1:])
    concat_vals = [None if lens[i] < 0
                   else blob[out_off[i]:out_off[i + 1]].decode()
                   for i in range(g)]

    # groups in first-appearance order: the stable sort keeps each
    # group's first row first, so the original position of the group's
    # first row orders the groups; recover it by re-sorting the original
    # row positions (stable sort permutation applied to arange)
    perm = _stable_sort_permutation(src, names, n)
    first_rows = perm[group_starts]
    app_order = np.argsort(first_rows, kind="stable")

    data: dict = {}
    for k, a in zip(names, key_attrs):
        kv = kvals[k][group_starts][app_order]
        if k in srt.dicts:
            dv = srt.dicts[k].values
            col_vals = [dv[int(x)] if 0 <= int(x) < len(dv) else None
                        for x in kv]
        else:
            col_vals = [x.item() for x in kv]
        if kvalid[k] is not None:
            ok = kvalid[k][group_starts][app_order]
            col_vals = [v if o else None for v, o in zip(col_vals, ok)]
        data[k] = col_vals
    data[output] = [concat_vals[i] for i in app_order]
    return Table.from_data(out_schema, data)


def _stable_sort_permutation(src: Table, names: Sequence[str],
                             n: int) -> "object":
    """Original row index of each output row of a stable key sort."""
    import numpy as np

    from ..ops.keys import group_code_columns
    pairs = group_code_columns(src, list(names))
    ops = []
    for nr, code in pairs:
        if nr is not None:
            ops.append(np.asarray(nr)[:n])
        ops.append(np.asarray(code)[:n])
    if not ops:
        return np.arange(n)
    # np.lexsort: LAST key is primary; stable, so ties keep input order
    return np.lexsort(tuple(reversed(ops)))


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
            # reference default print format: "%Y/%m/%d"
            # (types_infrastructure.cc:39)
            out_vals.append(d.strftime(fmt or "%Y/%m/%d"))
        elif attr.type == DataType.DATETIME:
            dt = (datetime.datetime(1970, 1, 1)
                  + datetime.timedelta(microseconds=int(v)))
            # reference: "%Y/%m/%d-%H:%M:%S" (types_infrastructure.cc:36)
            out_vals.append(dt.strftime(fmt or "%Y/%m/%d-%H:%M:%S"))
        elif isinstance(v, bool):
            # reference: "TRUE"/"FALSE" (types_infrastructure.cc:75-77)
            out_vals.append("TRUE" if v else "FALSE")
        elif attr.type in (DataType.FLOAT, DataType.DOUBLE):
            out_vals.append(_ref_print(v, attr.type))
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
