"""Record trace+compile seconds for the BASELINE.json config-scale plans
(VERDICT r2 next-round #8b: compile-time is an unmanaged hazard — put
numbers on it).

Times jax.jit(...).lower(...).compile() separately from the steady-state
run, for:
  config 3: sort 100M by (int32 ASC, f32 DESC)
  config 4: join probe 100M x build 1M (UNIQUE INNER)
  config 5/headline: filter -> join -> group-by(64) -> sort at 8M

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/compile_times.py
Prints one JSON line per config.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# Generous ceilings (VERDICT r3 next #8): a shape regression that
# re-awakens the superlinear remote-AOT behavior (142 s -> minutes)
# must fail loudly, not silently eat the benchmark budget.
# Round 5: the pipeline ceiling rises 30 -> 60 s because the aggregate
# pushdown deliberately adds a sort-based 1M-key pregroup (47.6 ->
# 35.9 ms steady state for ~+35 s of one-time compile); the emulated-
# f64-cumsum compile hog that used to cost high-cardinality group-bys
# ~100 s is fixed (ops/aggregate._hier_cumsum), so 60 s is now a real
# tripwire, not slack.
CEILINGS_S = {
    "config5_pipeline_8m": 60.0,
    "config4_join_100m_x_1m": 60.0,
    "config3_sort_100m": 300.0,  # known outlier: 142 s remote AOT
    "config2_groupby_10m_hi": 120.0,
}


def main():
    breaches = []
    import jax

    from supersonic_tpu import (AggSpec, Aggregation, Const, DataType,
                                Filter, GroupAggregate,
                                GroupAggregateOptions, HashJoin, JoinType,
                                KeyUniqueness, Projector, ScanTable, Sort,
                                Table, TupleSchema, col)
    from supersonic_tpu.ops.base import compile_plan

    rng = np.random.default_rng(0)

    def time_compile(name, plan):
        run, bound, leaves = compile_plan(plan)
        t0 = time.perf_counter()
        lowered = jax.jit(run).lower(leaves)
        trace_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(leaves)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        first_run_s = time.perf_counter() - t0
        ceiling = CEILINGS_S.get(name)
        breached = ceiling is not None and compile_s > ceiling
        if breached:
            breaches.append((name, compile_s, ceiling))
        print(json.dumps({"config": name, "trace_s": round(trace_s, 1),
                          "compile_s": round(compile_s, 1),
                          "first_run_s": round(first_run_s, 1),
                          "ceiling_s": ceiling,
                          "within_budget": not breached}))
        sys.stdout.flush()

    n8, m = 8_000_000, 1_000_000

    fact = Table.from_data(
        TupleSchema.of(("fk", DataType.INT32, False),
                       ("v", DataType.FLOAT, False),
                       ("g", DataType.INT32, False)),
        {"fk": rng.integers(0, m, n8).astype(np.int32),
         "v": rng.random(n8, dtype=np.float32),
         "g": rng.integers(0, 64, n8).astype(np.int32)})
    dim = Table.from_data(
        TupleSchema.of(("pk", DataType.INT32, False),
                       ("w", DataType.INT32, False)),
        {"pk": np.arange(m, dtype=np.int32),
         "w": rng.integers(0, 64, m).astype(np.int32)})
    pipeline = Sort(
        [("sv", False)],
        GroupAggregate(
            ["w"], [AggSpec(Aggregation.SUM, "v", "sv"),
                    AggSpec(Aggregation.COUNT, "v", "c")],
            HashJoin(JoinType.INNER, ["fk"], ["pk"],
                     Filter(col("v") > Const(0.5, DataType.FLOAT),
                            ScanTable(fact)),
                     ScanTable(dim), KeyUniqueness.UNIQUE,
                     lhs_projector=Projector.named("v"),
                     rhs_projector=Projector.named("w")),
            GroupAggregateOptions(estimated_result_row_count=64)))
    time_compile("config5_pipeline_8m", pipeline)

    # config-2 high-cardinality group-by: the shape whose compile was
    # silently dominated by the emulated-f64 carry cumsum before r5
    n10 = 10_000_000
    fact2 = Table.from_data(
        TupleSchema.of(("k", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)),
        {"k": rng.integers(0, 1 << 22, n10).astype(np.int32),
         "v": rng.random(n10, dtype=np.float32)})
    time_compile("config2_groupby_10m_hi",
                 GroupAggregate(["k"],
                                [AggSpec(Aggregation.SUM, "v", "sv")],
                                ScanTable(fact2),
                                GroupAggregateOptions(
                                    estimated_result_row_count=1 << 22)))
    del fact2

    n100 = 100_000_000
    big = Table.from_data(
        TupleSchema.of(("k", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)),
        {"k": rng.integers(0, 1 << 30, n100).astype(np.int32),
         "v": rng.random(n100, dtype=np.float32)})
    time_compile("config3_sort_100m",
                 Sort([("k", True), ("v", False)], ScanTable(big)))

    probe = Table.from_data(
        TupleSchema.of(("fk", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)),
        {"fk": rng.integers(0, m, n100).astype(np.int32),
         "v": rng.random(n100, dtype=np.float32)})
    time_compile("config4_join_100m_x_1m",
                 HashJoin(JoinType.INNER, ["fk"], ["pk"], ScanTable(probe),
                          ScanTable(dim), KeyUniqueness.UNIQUE,
                          lhs_projector=Projector.named("v"),
                          rhs_projector=Projector.named("w")))
    if breaches:
        for name, got, cap in breaches:
            print(f"COMPILE BUDGET BREACH: {name} took {got:.0f}s "
                  f"(ceiling {cap:.0f}s)", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
