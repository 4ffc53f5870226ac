"""Hash join tests (reference analogue: cursor/core/hash_join_test.cc)."""
import pytest

from supersonic_tpu import (DOUBLE, INT64, STRING, HashJoin, JoinType,
                            KeyUniqueness, Projector, ScanTable, Table,
                            TupleSchema, execute)


def sides():
    ls = TupleSchema.of(("fk", INT64), ("lv", DOUBLE))
    rs = TupleSchema.of(("pk", INT64), ("rv", STRING))
    lhs = Table.from_data(ls, {"fk": [1, 2, None, 4, 2],
                               "lv": [0.1, 0.2, 0.3, 0.4, 0.5]})
    rhs = Table.from_data(rs, {"pk": [2, 1, 3], "rv": ["two", "one", "three"]})
    return lhs, rhs


def test_inner_unique():
    lhs, rhs = sides()
    out = execute(HashJoin(JoinType.INNER, ["fk"], ["pk"],
                           ScanTable(lhs), ScanTable(rhs),
                           KeyUniqueness.UNIQUE))
    assert out.to_pylist() == [
        (1, 0.1, 1, "one"), (2, 0.2, 2, "two"), (2, 0.5, 2, "two")]


def test_left_outer_unique():
    lhs, rhs = sides()
    out = execute(HashJoin(JoinType.LEFT_OUTER, ["fk"], ["pk"],
                           ScanTable(lhs), ScanTable(rhs),
                           KeyUniqueness.UNIQUE))
    # NULL key and unmatched keys produce NULL rhs rows (hash_join.cc:801-806)
    assert out.to_pylist() == [
        (1, 0.1, 1, "one"), (2, 0.2, 2, "two"), (None, 0.3, None, None),
        (4, 0.4, None, None), (2, 0.5, 2, "two")]


def test_inner_multi():
    ls = TupleSchema.of(("k", INT64),)
    rs = TupleSchema.of(("k2", INT64), ("tag", INT64))
    lhs = Table.from_data(ls, {"k": [7, 8, 7]})
    rhs = Table.from_data(rs, {"k2": [7, 9, 7], "tag": [100, 200, 300]})
    out = execute(HashJoin(JoinType.INNER, ["k"], ["k2"],
                           ScanTable(lhs), ScanTable(rhs),
                           KeyUniqueness.NOT_UNIQUE))
    # matches per lhs row in rhs original order
    assert out.to_pylist() == [
        (7, 7, 100), (7, 7, 300), (7, 7, 100), (7, 7, 300)]


def test_left_outer_multi():
    ls = TupleSchema.of(("k", INT64),)
    rs = TupleSchema.of(("k2", INT64), ("tag", INT64))
    lhs = Table.from_data(ls, {"k": [5, 7]})
    rhs = Table.from_data(rs, {"k2": [7, 7], "tag": [1, 2]})
    out = execute(HashJoin(JoinType.LEFT_OUTER, ["k"], ["k2"],
                           ScanTable(lhs), ScanTable(rhs),
                           KeyUniqueness.NOT_UNIQUE, out_capacity=8))
    assert out.to_pylist() == [
        (5, None, None), (7, 7, 1), (7, 7, 2)]


def test_null_keys_never_match():
    ls = TupleSchema.of(("k", INT64),)
    rs = TupleSchema.of(("k2", INT64),)
    lhs = Table.from_data(ls, {"k": [None, 1]})
    rhs = Table.from_data(rs, {"k2": [None, 1]})
    out = execute(HashJoin(JoinType.INNER, ["k"], ["k2"],
                           ScanTable(lhs), ScanTable(rhs)))
    assert out.to_pylist() == [(1, 1)]


def test_string_key_join_different_dicts():
    ls = TupleSchema.of(("s", STRING), ("v", INT64))
    rs = TupleSchema.of(("s2", STRING), ("w", INT64))
    lhs = Table.from_data(ls, {"s": ["x", "y", "z"], "v": [1, 2, 3]})
    rhs = Table.from_data(rs, {"s2": ["y", "x"], "w": [20, 10]})
    out = execute(HashJoin(JoinType.INNER, ["s"], ["s2"],
                           ScanTable(lhs), ScanTable(rhs),
                           KeyUniqueness.UNIQUE))
    assert out.to_pylist() == [("x", 1, "x", 10), ("y", 2, "y", 20)]


def test_multi_key_join():
    ls = TupleSchema.of(("a", INT64), ("b", INT64))
    rs = TupleSchema.of(("a2", INT64), ("b2", INT64), ("w", INT64))
    lhs = Table.from_data(ls, {"a": [1, 1, 2], "b": [1, 2, 1]})
    rhs = Table.from_data(rs, {"a2": [1, 2], "b2": [2, 1], "w": [11, 21]})
    out = execute(HashJoin(JoinType.INNER, ["a", "b"], ["a2", "b2"],
                           ScanTable(lhs), ScanTable(rhs),
                           KeyUniqueness.UNIQUE))
    assert out.to_pylist() == [(1, 2, 1, 2, 11), (2, 1, 2, 1, 21)]


def test_projectors_select_columns():
    lhs, rhs = sides()
    out = execute(HashJoin(
        JoinType.INNER, ["fk"], ["pk"], ScanTable(lhs), ScanTable(rhs),
        KeyUniqueness.UNIQUE,
        lhs_projector=Projector.named("lv"),
        rhs_projector=Projector([("rv", "name")])))
    assert out.schema.names() == ("lv", "name")
    assert out.to_pylist() == [(0.1, "one"), (0.2, "two"), (0.5, "two")]


def test_empty_build_side():
    ls = TupleSchema.of(("k", INT64),)
    rs = TupleSchema.of(("k2", INT64),)
    lhs = Table.from_data(ls, {"k": [1, 2]})
    rhs = Table.from_data(rs, {"k2": []})
    out = execute(HashJoin(JoinType.LEFT_OUTER, ["k"], ["k2"],
                           ScanTable(lhs), ScanTable(rhs)))
    assert out.to_pylist() == [(1, None), (2, None)]
