"""Aggregation tests (reference analogue: aggregate_groups_test.cc,
aggregate_scalar_test, aggregate_clusters_test)."""
import pytest

from supersonic_tpu import (DOUBLE, INT64, STRING, AggregateClusters, AggSpec,
                            Aggregation, GroupAggregate, GroupAggregateOptions,
                            ScalarAggregate, ScanTable, Table, TupleSchema,
                            execute)

SUM, MIN, MAX, COUNT = (Aggregation.SUM, Aggregation.MIN, Aggregation.MAX,
                        Aggregation.COUNT)
FIRST, LAST = Aggregation.FIRST, Aggregation.LAST


def make_table():
    schema = TupleSchema.of(("k", STRING), ("v", INT64), ("x", DOUBLE))
    return Table.from_data(schema, {
        "k": ["b", "a", "b", None, "a", "b"],
        "v": [1, 2, 3, 4, None, 6],
        "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })


def test_group_sum_insertion_order():
    out = execute(GroupAggregate(["k"], [AggSpec(SUM, "v", "sv")],
                                 ScanTable(make_table())))
    # insertion order of first key occurrence: b, a, NULL
    assert out.to_pylist() == [("b", 10), ("a", 2), (None, 4)]


def test_group_count_min_max():
    out = execute(GroupAggregate(
        ["k"],
        [AggSpec(COUNT, "v", "c"), AggSpec(MIN, "v", "mn"),
         AggSpec(MAX, "v", "mx")],
        ScanTable(make_table())))
    assert out.to_pylist() == [
        ("b", 3, 1, 6), ("a", 1, 2, 2), (None, 1, 4, 4)]


def test_count_star():
    out = execute(GroupAggregate(["k"], [AggSpec(COUNT, None, "c")],
                                 ScanTable(make_table())))
    assert out.to_pylist() == [("b", 3), ("a", 2), (None, 1)]


def test_sum_all_null_group_is_null():
    schema = TupleSchema.of(("k", INT64), ("v", INT64))
    t = Table.from_data(schema, {"k": [1, 1, 2], "v": [None, None, 5]})
    out = execute(GroupAggregate(["k"], [AggSpec(SUM, "v", "s")],
                                 ScanTable(t)))
    assert out.to_pylist() == [(1, None), (2, 5)]


def test_first_last():
    out = execute(GroupAggregate(
        ["k"], [AggSpec(FIRST, "v", "f"), AggSpec(LAST, "v", "l")],
        ScanTable(make_table())))
    # FIRST/LAST include NULL values (assign semantics)
    assert out.to_pylist() == [("b", 1, 6), ("a", 2, None), (None, 4, 4)]


def test_multi_key_grouping():
    schema = TupleSchema.of(("k1", INT64), ("k2", INT64), ("v", INT64))
    t = Table.from_data(schema, {
        "k1": [1, 1, 2, 1], "k2": [1, 2, 1, 1], "v": [1, 2, 3, 4]})
    out = execute(GroupAggregate(["k1", "k2"], [AggSpec(SUM, "v", "s")],
                                 ScanTable(t)))
    assert out.to_pylist() == [(1, 1, 5), (1, 2, 2), (2, 1, 3)]


def test_distinct_count_sum():
    schema = TupleSchema.of(("k", INT64), ("v", INT64))
    t = Table.from_data(schema, {
        "k": [1, 1, 1, 2, 2], "v": [5, 5, 7, 5, 5]})
    out = execute(GroupAggregate(
        ["k"],
        [AggSpec(COUNT, "v", "dc", distinct=True),
         AggSpec(SUM, "v", "ds", distinct=True)],
        ScanTable(t)))
    assert out.to_pylist() == [(1, 2, 12), (2, 1, 5)]


def test_max_unique_keys_clamp():
    schema = TupleSchema.of(("k", INT64), ("v", INT64))
    t = Table.from_data(schema, {"k": [1, 2, 3, 4], "v": [1, 1, 1, 1]})
    out = execute(GroupAggregate(
        ["k"], [AggSpec(SUM, "v", "s")], ScanTable(t),
        GroupAggregateOptions(max_unique_keys_in_result=2)))
    rows = out.to_pylist()
    assert len(rows) == 2
    # overflow groups merged into the last kept group
    assert rows[0] == (1, 1)
    assert rows[1][1] == 3


def test_scalar_aggregate():
    out = execute(ScalarAggregate(
        [AggSpec(SUM, "v", "s"), AggSpec(COUNT, "v", "c"),
         AggSpec(MIN, "x", "mn")],
        ScanTable(make_table())))
    assert out.to_pylist() == [(16, 5, 1.0)]


def test_scalar_aggregate_empty_input():
    schema = TupleSchema.of(("v", INT64),)
    t = Table.from_data(schema, {"v": []})
    out = execute(ScalarAggregate(
        [AggSpec(SUM, "v", "s"), AggSpec(COUNT, "v", "c")], ScanTable(t)))
    assert out.to_pylist() == [(None, 0)]


def test_aggregate_clusters():
    schema = TupleSchema.of(("k", INT64), ("v", INT64))
    t = Table.from_data(schema, {
        "k": [1, 1, 3, 3, 2], "v": [1, 2, 3, 4, 5]})
    out = execute(AggregateClusters(["k"], [AggSpec(SUM, "v", "s")],
                                    ScanTable(t)))
    # clustered input: runs in encounter order; non-adjacent same keys stay
    # separate (streaming contract)
    assert out.to_pylist() == [(1, 3), (3, 7), (2, 5)]


def test_group_by_double_negzero():
    schema = TupleSchema.of(("k", DOUBLE), ("v", INT64))
    t = Table.from_data(schema, {"k": [0.0, -0.0], "v": [1, 2]})
    out = execute(GroupAggregate(["k"], [AggSpec(SUM, "v", "s")],
                                 ScanTable(t)))
    assert out.to_pylist() == [(0.0, 3)]


def test_multi_column_distinct():
    schema = TupleSchema.of(("k", INT64), ("a", INT64), ("b", INT64))
    t = Table.from_data(schema, {
        "k": [1, 1, 1, 2], "a": [5, 5, 7, 5], "b": [3, 4, 3, 3]})
    out = execute(GroupAggregate(
        ["k"],
        [AggSpec(Aggregation.COUNT, "a", "da", distinct=True),
         AggSpec(Aggregation.COUNT, "b", "db", distinct=True),
         AggSpec(Aggregation.SUM, "a", "sa")],
        ScanTable(t)))
    assert out.to_pylist() == [(1, 2, 2, 17), (2, 1, 1, 5)]
