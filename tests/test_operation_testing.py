"""Tests for the OperationTest sweep harness itself (reference:
operation_testing fixture usage patterns across cursor/core tests)."""
from supersonic_tpu import (INT64, AggSpec, Aggregation, Filter,
                            GroupAggregate, Sort, TupleSchema, col)
from supersonic_tpu.testing import OperationTest, check_operation


def test_filter_sweep():
    check_operation(
        lambda t: Filter(col("a") > 2, __import__("supersonic_tpu").ScanTable(t)),
        [(TupleSchema.of(("a", INT64),), {"a": [1, 3, None, 5]})],
        [(3,), (5,)],
    )


def test_group_aggregate_sweep_fixture():
    t = OperationTest()
    t.add_input(TupleSchema.of(("k", INT64), ("v", INT64)),
                {"k": [1, 2, 1], "v": [10, 20, 30]})
    t.set_expected_result([(1, 40), (2, 20)])
    t.execute(lambda inp: GroupAggregate(
        ["k"], [AggSpec(Aggregation.SUM, "v", "s")], inp))


def test_sort_sweep_ignore_order_off():
    t = OperationTest()
    t.add_input(TupleSchema.of(("a", INT64),), {"a": [3, None, 1]})
    t.set_expected_result([(None,), (1,), (3,)])
    t.execute(lambda inp: Sort(["a"], inp))
