"""Stage-level profile of the headline pipeline on the real chip.

Times sub-plans with the chained-in-jit harness from bench.py (the tunnel
adds ~25ms RPC per dispatch; chaining amortizes it away).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_data, FACT_ROWS, DIM_ROWS, GROUPS  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from supersonic_tpu import (AggSpec, Aggregation, Const, DataType, Filter,  # noqa: E402
                            GroupAggregate, GroupAggregateOptions, HashJoin,
                            JoinType, KeyUniqueness, Projector, ScanTable,
                            Sort, SortKey, Table, TupleSchema, col)
from supersonic_tpu.ops.base import compile_plan  # noqa: E402

ITERS = 8


def timed(label, run, leaves, reduce_out):
    def chained(leaves):
        fact_t = leaves[0]

        def body(carry, _):
            vcol = fact_t.columns["v"]
            perturbed = Table(
                fact_t.schema,
                {**fact_t.columns,
                 "v": vcol._replace(values=vcol.values + carry)},
                fact_t.num_rows, fact_t.dicts)
            out, flags = run([perturbed] + leaves[1:])
            return reduce_out(out) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    jrun = jax.jit(chained)
    np.asarray(jrun(leaves))
    noop = jax.jit(lambda x: x + 1)
    np.asarray(noop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(noop(jnp.float32(0)))
    rpc = (time.perf_counter() - t0) / 3
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jrun(leaves))
        times.append(time.perf_counter() - t0)
    per = max((min(times) - rpc) / ITERS, 1e-9)
    print(f"{label:55s} {per*1e3:8.2f} ms")
    return per


def main():
    fact, dim = build_data()
    fact_t = Table.from_data(
        TupleSchema.of(("fk", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)), fact)
    dim_t = Table.from_data(
        TupleSchema.of(("pk", DataType.INT32, False),
                       ("g", DataType.INT32, False)), dim)

    def scan_filter():
        return Filter(col("v") > Const(0.5, DataType.FLOAT),
                      ScanTable(fact_t))

    def join(inner):
        return HashJoin(JoinType.INNER, ["fk"], ["pk"], inner,
                        ScanTable(dim_t), KeyUniqueness.UNIQUE,
                        lhs_projector=Projector.named("v"),
                        rhs_projector=Projector.named("g"))

    def agg(inner):
        return GroupAggregate(
            ["g"],
            [AggSpec(Aggregation.SUM, "v", "sv"),
             AggSpec(Aggregation.COUNT, None, "c")],
            inner,
            GroupAggregateOptions(estimated_result_row_count=GROUPS))

    plans = {
        "full pipeline (filter+join+agg+sort)":
            (Sort([SortKey("sv", ascending=False)], agg(join(scan_filter()))),
             lambda o: o.columns["sv"].values[0].astype(jnp.float32)),
        "filter+join+agg (no sort)":
            (agg(join(scan_filter())),
             lambda o: o.columns["sv"].values[0].astype(jnp.float32)),
        "filter+join (compacted output)":
            (join(scan_filter()),
             lambda o: o.columns["v"].values[0].astype(jnp.float32)),
        "join only (no filter)":
            (join(ScanTable(fact_t)),
             lambda o: o.columns["v"].values[0].astype(jnp.float32)),
        "filter only":
            (scan_filter(),
             lambda o: o.columns["v"].values[0].astype(jnp.float32)),
        "agg direct on fact (g=fk%64)":
            (agg(ScanTable(Table.from_data(
                TupleSchema.of(("g", DataType.INT32, False),
                               ("v", DataType.FLOAT, False)),
                {"g": (fact["fk"] % 64).astype(np.int32),
                 "v": fact["v"]}))),
             lambda o: o.columns["sv"].values[0].astype(jnp.float32)),
    }
    for label, (plan, red) in plans.items():
        run, bound, leaves = compile_plan(plan)
        timed(label, run, leaves, red)

    # raw primitive costs at 8M
    fk = jnp.asarray(fact["fk"])
    v = jnp.asarray(fact["v"])
    packed = jnp.stack([jnp.asarray(dim["g"]),
                        jnp.ones(DIM_ROWS, jnp.int32)], axis=1)

    def raw(label, fn):
        def chained(fk, v):
            def body(carry, _):
                r = fn(fk, v + carry)
                return r.astype(jnp.float32) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return c
        jrun = jax.jit(chained)
        np.asarray(jrun(fk, v))
        t0 = time.perf_counter()
        np.asarray(jrun(fk, v))
        el = (time.perf_counter() - t0) / ITERS
        print(f"raw: {label:50s} {el*1e3:8.2f} ms")

    raw("packed gather [1M,2] x 8M idx",
        lambda fk, v: jnp.take(packed, fk, axis=0).sum(dtype=jnp.float32)
        + v[0])
    raw("1-lane gather [1M] x 8M idx",
        lambda fk, v: jnp.take(packed[:, 0], fk).sum(dtype=jnp.float32)
        + v[0])
    raw("sort 2M rows (2 ops)",
        lambda fk, v: jax.lax.sort([jnp.concatenate([fk, fk]),
                                    jnp.concatenate([v, v])],
                                   num_keys=1)[1][0])
    raw("cumsum 8M i32", lambda fk, v: jnp.cumsum(fk)[-1].astype(jnp.float32)
        + v[0])


if __name__ == "__main__":
    main()
