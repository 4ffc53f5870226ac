"""Date/time expressions.

Reference: expression/core/date_expressions.h, date_evaluators.cc.
Representation matches the reference: DATE = int32 days since the Unix
epoch; DATETIME = int64 **microseconds** since the epoch, UTC.  The
``*Local`` variants use the local timezone in the reference; this engine
is UTC-only, so Local variants alias the UTC ones (documented divergence —
production deployments pin TZ=UTC anyway).

Civil-calendar math uses Howard Hinnant's days<->civil algorithms as pure
integer arithmetic — branch-free and vectorizable on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..schema import Attribute
from ..types import DataType, TypeError_, jnp_dtype
from .base import (BoundExpression, EvalContext, Expression, ExprValue,
                   merge_valid, wrap)

US_PER_SEC = 1_000_000
US_PER_DAY = 86_400 * US_PER_SEC


def _civil_from_days(z):
    """days since epoch -> (year, month, day), vectorized (Hinnant)."""
    z = z.astype(jnp.int64) + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097                       # [0, 146096]
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)  # [0, 365]
    mp = (5 * doy + 2) // 153                    # [0, 11]
    d = doy - (153 * mp + 2) // 5 + 1            # [1, 31]
    m = jnp.where(mp < 10, mp + 3, mp - 9)       # [1, 12]
    y = jnp.where(m <= 2, y + 1, y)
    return y, m, d


def _days_from_civil(y, m, d):
    y = y.astype(jnp.int64)
    m = m.astype(jnp.int64)
    d = d.astype(jnp.int64)
    y = jnp.where(m <= 2, y - 1, y)
    era = jnp.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _to_us(b: BoundExpression, values: jnp.ndarray) -> jnp.ndarray:
    """DATE or DATETIME column -> microseconds since epoch (int64)."""
    if b.type == DataType.DATE:
        return values.astype(jnp.int64) * US_PER_DAY
    if b.type == DataType.DATETIME:
        return values.astype(jnp.int64)
    raise TypeError_(f"expected DATE/DATETIME, got {b.type}")


def _floordiv(a, b):
    return a // b  # jnp // floors, matching time-before-epoch semantics


def _field_expr(op_name: str, compute, out_type=DataType.INT32):
    class _Op(Expression):
        def __init__(self, child):
            self.child = wrap(child)

        def do_bind(self, schema, dicts):
            cb = self.child.do_bind(schema, dicts)

            def f(ctx: EvalContext) -> ExprValue:
                v = cb.evaluate(ctx)
                us = _to_us(cb, v.values)
                return ExprValue(
                    compute(us).astype(jnp_dtype(out_type)), v.valid)

            return BoundExpression(
                Attribute(f"{op_name}({cb.name})", out_type, cb.nullable), f)

    _Op.__name__ = op_name.title()
    return _Op


def _days(us):
    return _floordiv(us, US_PER_DAY)


Year = _field_expr("YEAR", lambda us: _civil_from_days(_days(us))[0])
Month = _field_expr("MONTH", lambda us: _civil_from_days(_days(us))[1])
Day = _field_expr("DAY", lambda us: _civil_from_days(_days(us))[2])
Quarter = _field_expr(
    "QUARTER", lambda us: (_civil_from_days(_days(us))[1] + 2) // 3)
# reference weekday: 0 = Monday .. 6 = Sunday (date_evaluators.cc); epoch
# day 0 (1970-01-01) was a Thursday (=3).
Weekday = _field_expr("WEEKDAY", lambda us: (_days(us) + 3) % 7)
YearDay = _field_expr(
    "YEARDAY",
    lambda us: _days(us) - _days_from_civil(
        _civil_from_days(_days(us))[0],
        jnp.ones_like(_days(us)), jnp.ones_like(_days(us))) + 1)
Hour = _field_expr(
    "HOUR", lambda us: _floordiv(us, 3600 * US_PER_SEC) % 24)
Minute = _field_expr(
    "MINUTE", lambda us: _floordiv(us, 60 * US_PER_SEC) % 60)
Second = _field_expr("SECOND", lambda us: _floordiv(us, US_PER_SEC) % 60)
Microsecond = _field_expr("MICROSECOND", lambda us: us % US_PER_SEC)

# UTC-only engine: Local variants alias UTC (see module docstring)
YearLocal, MonthLocal, DayLocal = Year, Month, Day
QuarterLocal, WeekdayLocal, YearDayLocal = Quarter, Weekday, YearDay
HourLocal, MinuteLocal, SecondLocal = Hour, Minute, Second


class UnixTimestamp(Expression):
    """DATETIME -> seconds since epoch (INT64)."""

    def __init__(self, child):
        self.child = wrap(child)

    def do_bind(self, schema, dicts):
        cb = self.child.do_bind(schema, dicts)

        def f(ctx):
            v = cb.evaluate(ctx)
            us = _to_us(cb, v.values)
            return ExprValue(_floordiv(us, US_PER_SEC), v.valid)

        return BoundExpression(
            Attribute(f"UNIXTIMESTAMP({cb.name})", DataType.INT64,
                      cb.nullable), f)


class FromUnixTime(Expression):
    """seconds since epoch -> DATETIME."""

    def __init__(self, child):
        self.child = wrap(child)

    def do_bind(self, schema, dicts):
        cb = self.child.do_bind(schema, dicts)

        def f(ctx):
            v = cb.evaluate(ctx)
            return ExprValue(v.values.astype(jnp.int64) * US_PER_SEC,
                             v.valid)

        return BoundExpression(
            Attribute(f"FROMUNIXTIME({cb.name})", DataType.DATETIME,
                      cb.nullable), f)


class MakeDate(Expression):
    """MAKEDATE(year, month, day) -> DATETIME at UTC 0:00 of that date
    (reference: date_expressions.h:53-56, expression_traits
    OPERATOR_MAKEDATE output_type INT64/DATETIME).  Invalid dates -> NULL
    (the reference signals an evaluation failure instead — documented
    divergence, PARITY.md)."""

    def __init__(self, year, month, day):
        self.year = wrap(year)
        self.month = wrap(month)
        self.day = wrap(day)

    def do_bind(self, schema, dicts):
        yb = self.year.do_bind(schema, dicts)
        mb = self.month.do_bind(schema, dicts)
        db = self.day.do_bind(schema, dicts)

        def f(ctx):
            y = yb.evaluate(ctx)
            m = mb.evaluate(ctx)
            d = db.evaluate(ctx)
            yv, mv, dv = (y.values.astype(jnp.int64),
                          m.values.astype(jnp.int64),
                          d.values.astype(jnp.int64))
            days = _days_from_civil(yv, mv, dv)
            # validity: round-trip check catches out-of-range month/day
            ry, rm, rd = _civil_from_days(days)
            ok = (ry == yv) & (rm == mv) & (rd == dv)
            valid = merge_valid(y.valid, m.valid, d.valid, ok)
            return ExprValue(days * US_PER_DAY, valid)

        return BoundExpression(
            Attribute("MAKEDATE", DataType.DATETIME, True), f)


class MakeDatetime(Expression):
    def __init__(self, year, month, day, hour, minute, second):
        self.parts = [wrap(x) for x in (year, month, day, hour, minute,
                                        second)]

    def do_bind(self, schema, dicts):
        bs = [p.do_bind(schema, dicts) for p in self.parts]

        def f(ctx):
            vs = [b.evaluate(ctx) for b in bs]
            y, m, d, hh, mm, ss = [v.values.astype(jnp.int64) for v in vs]
            days = _days_from_civil(y, m, d)
            ry, rm, rd = _civil_from_days(days)
            ok = ((ry == y) & (rm == m) & (rd == d) & (hh >= 0) & (hh < 24)
                  & (mm >= 0) & (mm < 60) & (ss >= 0) & (ss < 60))
            us = (days * US_PER_DAY + (hh * 3600 + mm * 60 + ss) * US_PER_SEC)
            valid = merge_valid(*(v.valid for v in vs), ok)
            return ExprValue(us, valid)

        return BoundExpression(
            Attribute("MAKEDATETIME", DataType.DATETIME, True), f)


class AddDays(Expression):
    def __init__(self, child, days):
        self.child = wrap(child)
        self.days = wrap(days)

    def do_bind(self, schema, dicts):
        cb = self.child.do_bind(schema, dicts)
        db = self.days.do_bind(schema, dicts)

        def f(ctx):
            v = cb.evaluate(ctx)
            d = db.evaluate(ctx)
            us = _to_us(cb, v.values) + d.values.astype(jnp.int64) * US_PER_DAY
            return ExprValue(us, merge_valid(v.valid, d.valid))

        return BoundExpression(
            Attribute(f"ADD_DAYS({cb.name})", DataType.DATETIME,
                      cb.nullable or db.nullable), f)


class AddMinutes(Expression):
    def __init__(self, child, minutes):
        self.child = wrap(child)
        self.minutes = wrap(minutes)

    def do_bind(self, schema, dicts):
        cb = self.child.do_bind(schema, dicts)
        mb = self.minutes.do_bind(schema, dicts)

        def f(ctx):
            v = cb.evaluate(ctx)
            m = mb.evaluate(ctx)
            us = _to_us(cb, v.values) + \
                m.values.astype(jnp.int64) * 60 * US_PER_SEC
            return ExprValue(us, merge_valid(v.valid, m.valid))

        return BoundExpression(
            Attribute(f"ADD_MINUTES({cb.name})", DataType.DATETIME,
                      cb.nullable or mb.nullable), f)


class AddMonths(Expression):
    """AddMonths clamps day-of-month into the target month's length
    (reference: date_evaluators.cc AddMonths)."""

    def __init__(self, child, months):
        self.child = wrap(child)
        self.months = wrap(months)

    def do_bind(self, schema, dicts):
        cb = self.child.do_bind(schema, dicts)
        mb = self.months.do_bind(schema, dicts)

        def f(ctx):
            v = cb.evaluate(ctx)
            mm = mb.evaluate(ctx)
            us = _to_us(cb, v.values)
            days = _days(us)
            tod = us - days * US_PER_DAY
            y, m, d = _civil_from_days(days)
            total = (y * 12 + (m - 1)) + mm.values.astype(jnp.int64)
            ny = total // 12
            nm = total % 12 + 1
            # clamp day to target month length
            first_next = _days_from_civil(
                jnp.where(nm == 12, ny + 1, ny),
                jnp.where(nm == 12, jnp.ones_like(nm), nm + 1),
                jnp.ones_like(nm))
            first_this = _days_from_civil(ny, nm, jnp.ones_like(nm))
            month_len = first_next - first_this
            nd = jnp.minimum(d, month_len)
            out = _days_from_civil(ny, nm, nd) * US_PER_DAY + tod
            return ExprValue(out, merge_valid(v.valid, mm.valid))

        return BoundExpression(
            Attribute(f"ADD_MONTHS({cb.name})", DataType.DATETIME,
                      cb.nullable or mb.nullable), f)


class DateToDatetime(Expression):
    """DATE -> DATETIME at midnight (reference: OPERATOR_DATE_TO_DATETIME,
    base/infrastructure/operators.h:54; also the implicit DATE->DATETIME
    promotion)."""

    def __init__(self, child):
        self.child = wrap(child)

    def do_bind(self, schema, dicts):
        cb = self.child.do_bind(schema, dicts)
        if cb.type == DataType.DATETIME:
            return cb
        if cb.type != DataType.DATE:
            raise TypeError_(f"DATE_TO_DATETIME requires DATE, got {cb.type}")

        def f(ctx):
            v = cb.evaluate(ctx)
            return ExprValue(v.values.astype(jnp.int64) * US_PER_DAY,
                             v.valid)

        return BoundExpression(
            Attribute(f"DATE_TO_DATETIME({cb.name})", DataType.DATETIME,
                      cb.nullable), f)
