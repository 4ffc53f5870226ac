"""Headline benchmark: full filter -> hash-join -> group-by -> sort pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against the REAL reference engine, built from /root/reference
(refbuild/) and measured on this host: the same
filter -> join -> group-by(64) -> sort pipeline over the same 8M x 1M data
takes it 217.7 ms single-threaded at -O3 (refbuild/bin/baseline_bench,
best of 3; BASELINE.md "Measured results").  A single-threaded NumPy
implementation is also timed and reported on stderr as a sanity cross-check
(it lands within ~4x of the C++ engine).
Per-operator details go to stderr.
"""
import json
import sys
import time

import numpy as np

FACT_ROWS = 8_000_000
DIM_ROWS = 1_000_000
GROUPS = 64
# The reference engine's time on this exact pipeline (refbuild/, see module
# docstring): single-threaded C++ at -O3, best of 3 cursor-drains.
REFERENCE_PIPELINE_S = 0.2177


def build_data():
    rng = np.random.default_rng(42)
    fact = {
        "fk": rng.integers(0, DIM_ROWS, FACT_ROWS).astype(np.int32),
        "v": rng.random(FACT_ROWS, dtype=np.float32),
    }
    dim = {
        "pk": np.arange(DIM_ROWS, dtype=np.int32),
        "g": rng.integers(0, GROUPS, DIM_ROWS).astype(np.int32),
    }
    return fact, dim


def numpy_baseline(fact, dim):
    t0 = time.perf_counter()
    keep = fact["v"] > 0.5
    fk = fact["fk"][keep]
    v = fact["v"][keep]
    g = dim["g"][fk]  # pk is arange => direct index join
    sums = np.bincount(g, weights=v.astype(np.float64), minlength=GROUPS)
    counts = np.bincount(g, minlength=GROUPS)
    order = np.argsort(-sums, kind="stable")
    _ = sums[order], counts[order]
    return time.perf_counter() - t0


def tpu_pipeline(fact, dim):
    import jax

    from supersonic_tpu import (AggSpec, Aggregation, Const, DataType, Filter,
                                GroupAggregate, GroupAggregateOptions,
                                HashJoin, JoinType, KeyUniqueness, Projector,
                                ScanTable, Sort, SortKey, Table, TupleSchema,
                                col)
    from supersonic_tpu.ops.base import compile_plan

    fact_t = Table.from_data(
        TupleSchema.of(("fk", DataType.INT32, False),
                       ("v", DataType.FLOAT, False)), fact)
    dim_t = Table.from_data(
        TupleSchema.of(("pk", DataType.INT32, False),
                       ("g", DataType.INT32, False)), dim)
    # SUM keeps the input type (FLOAT), matching the reference's default
    # output-type rule (aggregation_operators.h)
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
            GroupAggregateOptions(estimated_result_row_count=GROUPS),
        ))
    run, bound, leaves = compile_plan(plan)
    import jax.numpy as jnp

    # This terminal tunnels TPU dispatch; block_until_ready returns before
    # the device finishes, and each dispatch costs ~25ms RPC.  So: chain
    # ITERS executions inside one jit via a data-dependent carry (can't be
    # hoisted), force one host read-back, and subtract the measured RPC
    # round-trip overhead.
    ITERS = 8

    def chained(leaves):
        fact_t = leaves[0]

        def body(carry, _):
            # perturb EVERY fact column: key-only subcomputations (the
            # join's probe slots and fat-LUT gather) are loop-INVARIANT
            # under a value-only perturbation and XLA's while-loop LICM
            # hoists them out of the timing scan — under-measuring the
            # pipeline by its whole probe gather (found r4c; same flaw
            # class as the sliced checksum, bench_ops.py::perturb_all)
            cols = {n: c._replace(values=c.values
                                  + carry.astype(c.values.dtype))
                    for n, c in fact_t.columns.items()}
            perturbed = Table(fact_t.schema, cols, fact_t.num_rows,
                              fact_t.dicts)
            out, flags = run([perturbed] + leaves[1:])
            # not provably zero => body can't be hoisted out of the scan.
            # Fold EVERY output column order-sensitively: a checksum that
            # reads one element lets XLA dead-code-eliminate unread
            # columns (e.g. the COUNT aggregate) and simplify the sort —
            # under-measuring the plan (found in round 3; bench_ops.py's
            # harness had the same fix).
            # Fold the FULL column (not a prefix): a sliced sorted prefix
            # is TopK-rewritable, which would let a partial sort stand in
            # for the real one inside the timing loop (VERDICT r3 weak #4).
            s = jnp.float32(0)
            for c in out.columns.values():
                flat = c.values.ravel().astype(jnp.float32)
                w = (jnp.arange(flat.shape[0]) % 13).astype(jnp.float32)
                s = s + jnp.dot(flat, w)
            return (s * 1e-30).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    jrun = jax.jit(chained)
    t0 = time.perf_counter()
    np.asarray(jrun(leaves))  # warm up / compile
    compile_s = time.perf_counter() - t0
    # compile-time budget guard (VERDICT r3 next #8): the headline
    # pipeline must stay well under the remote-AOT pathology regime
    print(f"pipeline compile+first-run: {compile_s:.1f} s "
          f"(budget 60 s)", file=sys.stderr)
    if compile_s > 60:
        print("COMPILE BUDGET BREACH: pipeline compile exceeded 60 s — "
              "a shape regression likely re-awakened the superlinear "
              "remote-AOT scaling (BASELINE.md)", file=sys.stderr)

    noop = jax.jit(lambda x: x + 1)
    np.asarray(noop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(noop(jnp.float32(0)))
    rpc_overhead = (time.perf_counter() - t0) / 3

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jrun(leaves))
        times.append(time.perf_counter() - t0)
    per_iter = max((min(times) - rpc_overhead) / ITERS, 1e-9)
    # one plain run for the result table
    out, _flags = jax.jit(run)(leaves)
    return per_iter, out


def main():
    import signal

    fact, dim = build_data()
    base_s = numpy_baseline(fact, dim)
    base_rows = FACT_ROWS / base_s
    print(f"numpy baseline: {base_s*1e3:.1f} ms "
          f"({base_rows/1e6:.1f} M rows/s)", file=sys.stderr)

    # The tunneled TPU backend occasionally wedges (hangs on compile RPC);
    # emit a parseable failure line instead of hanging the harness.
    def on_timeout(signum, frame):
        print("TPU tunnel unresponsive — emitting failure record",
              file=sys.stderr)
        print(json.dumps({
            "metric": "pipeline_rows_per_s",
            "value": 0,
            "unit": "rows/s (TPU tunnel unresponsive; see stderr)",
            "vs_baseline": 0,
        }))
        sys.stdout.flush()
        import os
        os._exit(3)

    signal.signal(signal.SIGALRM, on_timeout)
    signal.alarm(int(float(__import__("os").environ.get(
        "BENCH_TIMEOUT_S", "480"))))
    tpu_s, out = tpu_pipeline(fact, dim)
    signal.alarm(0)
    tpu_rows = FACT_ROWS / tpu_s
    print(f"tpu pipeline:  {tpu_s*1e3:.1f} ms "
          f"({tpu_rows/1e6:.1f} M rows/s), groups={int(out.num_rows)}",
          file=sys.stderr)
    ref_rows = FACT_ROWS / REFERENCE_PIPELINE_S
    print(f"reference C++ engine: {REFERENCE_PIPELINE_S*1e3:.1f} ms "
          f"({ref_rows/1e6:.1f} M rows/s) [recorded, refbuild/]",
          file=sys.stderr)
    print(json.dumps({
        "metric": "pipeline_rows_per_s",
        "value": round(tpu_rows, 1),
        "unit": "rows/s",
        "vs_baseline": round(tpu_rows / ref_rows, 3),
    }))


if __name__ == "__main__":
    main()
