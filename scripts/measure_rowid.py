"""Single-dispatch pipeline cost: rowid-direct probe vs fat-LUT probe."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_data, GROUPS  # noqa: E402

import jax  # noqa: E402

from supersonic_tpu import (AggSpec, Aggregation, Const, DataType, Filter,  # noqa: E402
                            GroupAggregate, GroupAggregateOptions, HashJoin,
                            JoinType, KeyUniqueness, Projector, ScanTable,
                            Sort, SortKey, Table, TupleSchema, col)
from supersonic_tpu.ops.base import compile_plan  # noqa: E402


def run_variant(label, fact, dim, perm):
    if perm is not None:
        dim = {"pk": dim["pk"][perm], "g": dim["g"][perm]}
    fact_t = Table.from_data(
        TupleSchema.of(("fk", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)), fact)
    dim_t = Table.from_data(
        TupleSchema.of(("pk", DataType.INT32, False),
                       ("g", DataType.INT32, False)), dim)
    plan = Sort(
        [SortKey("sv", ascending=False)],
        GroupAggregate(
            ["g"],
            [AggSpec(Aggregation.SUM, "v", "sv"),
             AggSpec(Aggregation.COUNT, None, "c")],
            HashJoin(JoinType.INNER, ["fk"], ["pk"],
                     Filter(col("v") > Const(0.5, DataType.FLOAT),
                            ScanTable(fact_t)),
                     ScanTable(dim_t), KeyUniqueness.UNIQUE,
                     lhs_projector=Projector.named("v"),
                     rhs_projector=Projector.named("g")),
            GroupAggregateOptions(estimated_result_row_count=GROUPS)))
    run, bound, leaves = compile_plan(plan)
    jrun = jax.jit(run)
    out, _ = jrun(leaves)
    np.asarray(out.columns["sv"].values[:1])  # warm
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        out, _ = jrun(leaves)
        np.asarray(out.columns["sv"].values[:1])
        times.append(time.perf_counter() - t0)
    print(f"{label:30s} single-dispatch best {min(times)*1e3:.1f} ms  "
          f"(sv[0]={float(np.asarray(out.columns['sv'].values[0])):.2f})")


def main():
    fact, dim = build_data()
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(dim["pk"]))
    run_variant("rowid-direct (pk = arange)", fact, dim, None)
    run_variant("fat LUT (pk permuted)", fact, dim, perm)


if __name__ == "__main__":
    main()
