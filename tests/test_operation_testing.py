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


def test_hash_join_sweep():
    from supersonic_tpu import (HashJoin, JoinType, KeyUniqueness, ScanTable)
    check_operation(
        lambda lt, rt: HashJoin(
            JoinType.LEFT_OUTER, ["fk"], ["pk"],
            __import__("supersonic_tpu").ScanTable(lt),
            __import__("supersonic_tpu").ScanTable(rt),
            KeyUniqueness.UNIQUE),
        [(TupleSchema.of(("fk", INT64),), {"fk": [1, 9, 2]}),
         (TupleSchema.of(("pk", INT64), ("w", INT64)),
          {"pk": [1, 2], "w": [10, 20]})],
        [(1, 1, 10), (9, None, None), (2, 2, 20)],
    )


def test_merge_union_sweep():
    from supersonic_tpu import MergeUnionAll
    check_operation(
        lambda a, b: MergeUnionAll(
            ["k"], [__import__("supersonic_tpu").ScanTable(a),
                    __import__("supersonic_tpu").ScanTable(b)]),
        [(TupleSchema.of(("k", INT64),), {"k": [1, 5]}),
         (TupleSchema.of(("k", INT64),), {"k": [2, 3]})],
        [(1,), (2,), (3,), (5,)],
    )


def test_aggregate_clusters_sweep():
    from supersonic_tpu import AggregateClusters, AggSpec, Aggregation
    check_operation(
        lambda t: AggregateClusters(
            ["k"], [AggSpec(Aggregation.MIN, "v", "mn"),
                    AggSpec(Aggregation.MAX, "v", "mx")],
            __import__("supersonic_tpu").ScanTable(t)),
        [(TupleSchema.of(("k", INT64), ("v", INT64)),
          {"k": [1, 1, 2, 1], "v": [3, 1, 9, 4]})],
        [(1, 1, 3), (2, 9, 9), (1, 4, 4)],
    )
