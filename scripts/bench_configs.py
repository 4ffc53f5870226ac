"""Steady-state timing for BASELINE.json configs 3/4 on the real chip
(the 100M-row shapes; best-of-3 chained-iteration timing with the
hardened full-column checksum).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_configs.py
Budget ~10-20 min: the 100M sort's first compile is the known ~142 s
remote-AOT outlier (BASELINE.md) — do not kill it.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from profile_sort import timed  # noqa: E402


def main():
    import jax

    from supersonic_tpu import (DataType, HashJoin, JoinType,
                                KeyUniqueness, Projector, ScanTable, Sort,
                                Table, TupleSchema)
    from supersonic_tpu.ops.base import compile_plan

    rng = np.random.default_rng(0)
    n100, m = 100_000_000, 1_000_000

    # compile-budget enforcement (VERDICT r4 next #7): bench_configs
    # compiles every config anyway — a breach fails the run loudly
    # instead of silently eating the benchmark budget
    ceilings = {"config2 groupby 10M->50 (4 aggs)": 120.0,
                "config2 groupby 10M->~3.9M SUM": 120.0,
                "config3 sort 100M": 300.0,
                "config4 join 100M x 1M": 60.0}
    breaches = []

    def bench(name, plan, leaves_col, rows, iters=4):
        run, bound, leaves = compile_plan(plan)

        def oprun(t):
            out, flags = run([t] + leaves[1:])
            return [c.values for c in out.columns.values()]

        from supersonic_tpu import Table as T

        def perturb(args, c):
            # perturb EVERY column (numerically-zero carry delta):
            # key-only subcomputations (probe gathers, masks, boundary
            # scans) are loop-INVARIANT under a value-only perturbation
            # and XLA hoists them out of the timing scan — the round-4
            # config-4 number measured the join minus its whole 100M
            # probe gather that way (re-measured r4c; same flaw class
            # as the sliced-checksum bug, bench_ops.py::perturb_all)
            t = args[0]
            cols = {n: col._replace(values=col.values
                                    + c.astype(col.values.dtype))
                    for n, col in t.columns.items()}
            return [T(t.schema, cols, t.num_rows, t.dicts)]

        comp = []
        secs = timed(oprun, [leaves[0]], iters=iters, perturb=perturb,
                     compile_out=comp)
        ceil = ceilings.get(name)
        note = ""
        if ceil is not None and comp and comp[0] > ceil:
            breaches.append((name, comp[0], ceil))
            note = f"  COMPILE BREACH ({comp[0]:.0f}s > {ceil:.0f}s)"
        print(f"{name:<28} {secs*1e3:9.1f} ms  "
              f"{rows/secs/1e6:8.1f} M rows/s  "
              f"(compile+first {comp[0]:.0f}s){note}", flush=True)
        return secs

    from supersonic_tpu import (AggSpec, Aggregation, GroupAggregate,
                                GroupAggregateOptions)

    n10 = 10_000_000
    words = np.array([f"cat_{i:02d}" for i in range(50)])
    fact2 = Table.from_data(
        TupleSchema.of(("g", DataType.STRING, False),
                       ("k", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)),
        {"g": words[rng.integers(0, 50, n10)],
         "k": rng.integers(0, 1 << 22, n10).astype(np.int32),
         "v": rng.random(n10, dtype=np.float32)})
    bench("config2 groupby 10M->50 (4 aggs)",
          GroupAggregate(["g"],
                         [AggSpec(Aggregation.SUM, "v", "sv"),
                          AggSpec(Aggregation.MIN, "v", "mn"),
                          AggSpec(Aggregation.MAX, "v", "mx"),
                          AggSpec(Aggregation.COUNT, None, "n")],
                         ScanTable(fact2),
                         GroupAggregateOptions(
                             estimated_result_row_count=64)),
          "v", n10, iters=4)
    bench("config2 groupby 10M->~3.9M SUM",
          GroupAggregate(["k"],
                         [AggSpec(Aggregation.SUM, "v", "sv")],
                         ScanTable(fact2),
                         GroupAggregateOptions(
                             estimated_result_row_count=1 << 22)),
          "v", n10, iters=4)
    del fact2

    big = Table.from_data(
        TupleSchema.of(("k", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)),
        {"k": rng.integers(0, 1 << 30, n100).astype(np.int32),
         "v": rng.random(n100, dtype=np.float32)})
    bench("config3 sort 100M", Sort([("k", True), ("v", False)],
                                    ScanTable(big)), "v", n100, iters=3)
    del big

    dim = Table.from_data(
        TupleSchema.of(("pk", DataType.INT32, False),
                       ("w", DataType.INT32, False)),
        {"pk": np.arange(m, dtype=np.int32),
         "w": rng.integers(0, 64, m).astype(np.int32)})
    probe = Table.from_data(
        TupleSchema.of(("fk", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)),
        {"fk": rng.integers(0, m, n100).astype(np.int32),
         "v": rng.random(n100, dtype=np.float32)})
    bench("config4 join 100M x 1M",
          HashJoin(JoinType.INNER, ["fk"], ["pk"], ScanTable(probe),
                   ScanTable(dim), KeyUniqueness.UNIQUE,
                   lhs_projector=Projector.named("v"),
                   rhs_projector=Projector.named("w")), "v", n100,
          iters=3)
    if breaches:
        for nm, got, cap in breaches:
            print(f"COMPILE BUDGET BREACH: {nm} took {got:.0f}s "
                  f"(ceiling {cap:.0f}s)", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
