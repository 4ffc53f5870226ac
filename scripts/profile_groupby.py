"""Round-4 on-chip stage profile of the high-cardinality group-by
(bench_ops "groupby 8M->1M keys": 93 ms r4, the weakest reference
margin at 3.6x).  Times each stage of the general sort-based path in
isolation to find where the non-sort ~55 ms goes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_groupby.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from profile_sort import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from supersonic_tpu.ops.filter import compact_arrays

    N, M = 8_000_000, 1_000_000
    rng = np.random.default_rng(0)
    fk = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
    v = jnp.asarray(rng.random(N, dtype=np.float32))
    pos = jnp.arange(N, dtype=jnp.int32)
    pad = jnp.zeros(N, jnp.int32)

    def row(name, fn, args, **kw):
        s = timed(fn, args, **kw)
        print(f"{name:<44} {s*1e3:8.2f} ms", flush=True)
        return s

    # 1. the aggregate's current base sort: [pad, code] keys + [pos, v]
    row("sort 4op (pad,code | pos,v)",
        lambda p, c, r, w: jax.lax.sort([p, c, r, w], num_keys=2,
                                        is_stable=True),
        [pad, fk, pos, v],
        perturb=lambda a, c: [a[0], a[1], a[2], a[3] + c])

    # 2. pad packed into the bounded int key -> 3 operands
    row("sort 3op (packed code | pos,v)",
        lambda c, r, w: jax.lax.sort([c, r, w], num_keys=1,
                                     is_stable=True),
        [fk, pos, v],
        perturb=lambda a, c: [a[0], a[1], a[2] + c])

    # 3. cumsums at 8M
    row("cumsum i32 8M", lambda m: jnp.cumsum(m), [pos])
    row("cumsum f32 8M", lambda w: jnp.cumsum(w), [v])
    row("cumsum f64 8M (emulated)",
        lambda w: jnp.cumsum(w.astype(jnp.float64)), [v])

    # 4. boundary rolls
    def boundary(c):
        prev_same = c == jnp.roll(c, 1)
        b = (~prev_same) | (pos == 0)
        is_end = jnp.roll(b, -1) | (pos == N - 1)
        return b, is_end

    row("boundary rolls", boundary, [fk])

    # 5. kernel compaction 8M -> 1M with 2 / 3 payloads
    mask = jnp.asarray(rng.random(N) < (M / N))
    row("compact 8M->1.2M x2 cols",
        lambda a, b: compact_arrays([a, b], mask, 1 << 21),
        [fk, v], perturb=lambda a, c: [a[0], a[1] + c])
    row("compact 8M->1.2M x3 cols",
        lambda a, b, c_: compact_arrays([a, b, c_], mask, 1 << 21),
        [fk, v, pos], perturb=lambda a, c: [a[0], a[1] + c, a[2]])

    # 6. rerank sort at 1M (2 keys + 2 payloads)
    fk1 = fk[:1 << 21]
    v1 = v[:1 << 21]
    p1 = pos[:1 << 21]
    z1 = pad[:1 << 21]
    row("rerank sort 2M 4op",
        lambda p, c, r, w: jax.lax.sort([p, c, r, w], num_keys=2,
                                        is_stable=True),
        [z1, fk1, p1, v1],
        perturb=lambda a, c: [a[0], a[1], a[2], a[3] + c])

    # 7. the full plan, for reference
    from supersonic_tpu import (AggSpec, Aggregation, DataType,
                                GroupAggregate, GroupAggregateOptions,
                                ScanTable, Table, TupleSchema)
    from supersonic_tpu.ops.base import compile_plan

    t = Table.from_data(
        TupleSchema.of(("fk", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)),
        {"fk": np.asarray(fk), "v": np.asarray(v)})
    plan = GroupAggregate(["fk"], [AggSpec(Aggregation.SUM, "v", "sv")],
                          ScanTable(t),
                          GroupAggregateOptions(estimated_result_row_count=M))
    run, bound, leaves = compile_plan(plan)

    def oprun(tab):
        out, flags = run([tab] + leaves[1:])
        return [c.values for c in out.columns.values()]

    def perturb(args, c):
        tt = args[0]
        vcol = tt.columns["v"]
        t2 = Table(tt.schema, {**tt.columns,
                               "v": vcol._replace(values=vcol.values + c)},
                   tt.num_rows, tt.dicts)
        return [t2]

    row("FULL groupby 8M->1M plan", oprun, [leaves[0]], perturb=perturb)


if __name__ == "__main__":
    main()
