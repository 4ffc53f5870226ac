"""Per-stage timing of the headline pipeline on the real chip.

Times nested plan prefixes with the same chained-in-jit methodology as
bench.py so stage costs (filter / join / group-by / sort) can be read off
by differencing.
"""
import sys
import time

import numpy as np

FACT_ROWS = 8_000_000
DIM_ROWS = 1_000_000
GROUPS = 64
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    from supersonic_tpu import (AggSpec, Aggregation, Const, DataType, Filter,
                                GroupAggregate, GroupAggregateOptions,
                                HashJoin, JoinType, KeyUniqueness, Projector,
                                ScanTable, Sort, SortKey, Table, TupleSchema,
                                col)
    from supersonic_tpu.ops.base import compile_plan

    rng = np.random.default_rng(42)
    fact_t = Table.from_data(
        TupleSchema.of(("fk", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)),
        {"fk": rng.integers(0, DIM_ROWS, FACT_ROWS).astype(np.int32),
         "v": rng.random(FACT_ROWS, dtype=np.float32)})
    dim_t = Table.from_data(
        TupleSchema.of(("pk", DataType.INT32, False),
                       ("g", DataType.INT32, False)),
        {"pk": np.arange(DIM_ROWS, dtype=np.int32),
         "g": rng.integers(0, GROUPS, DIM_ROWS).astype(np.int32)})

    def scan_only():
        return Filter(col("v") > Const(0.5, DataType.FLOAT),
                      ScanTable(fact_t))

    def join_plan():
        return HashJoin(JoinType.INNER, ["fk"], ["pk"],
                        scan_only(), ScanTable(dim_t), KeyUniqueness.UNIQUE,
                        lhs_projector=Projector.named("v"),
                        rhs_projector=Projector.named("g"))

    def agg_plan():
        return GroupAggregate(
            ["g"], [AggSpec(Aggregation.SUM, "v", "sv"),
                    AggSpec(Aggregation.COUNT, None, "c")],
            join_plan(),
            GroupAggregateOptions(estimated_result_row_count=GROUPS))

    def full_plan():
        return Sort([SortKey("sv", ascending=False)], agg_plan())

    noop = jax.jit(lambda x: x + 1)
    np.asarray(noop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(noop(jnp.float32(0)))
    rpc = (time.perf_counter() - t0) / 3

    def bench(name, plan, probe_col="v"):
        run, bound, leaves = compile_plan(plan)

        def chained(leaves):
            ft = leaves[0]

            def body(carry, _):
                vcol = ft.columns["v"]
                pert = Table(ft.schema,
                             {**ft.columns,
                              "v": vcol._replace(values=vcol.values + carry)},
                             ft.num_rows, ft.dicts)
                out, flags = run([pert] + leaves[1:])
                c0 = out.columns[probe_col].values[0]
                return (c0.astype(jnp.float32) * 1e-30), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return c

        jrun = jax.jit(chained)
        np.asarray(jrun(leaves))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jrun(leaves))
            times.append(time.perf_counter() - t0)
        per = (min(times) - rpc) / ITERS
        print(f"{name:30s} {per*1e3:8.1f} ms", flush=True)
        return per

    bench("filter(scan)", scan_only(), "v")
    bench("filter+join", join_plan(), "v")
    bench("filter+join+groupby", agg_plan(), "sv")
    bench("full (bench.py pipeline)", full_plan(), "sv")


if __name__ == "__main__":
    main()
