"""Round-4 on-chip probes: where does sort/group-by time go, and what
can kernels legally touch.

 1. raw lax.sort at 8M with varying operand counts (is the cost
    operand-linear? how much does each payload operand add?)
 2. the bench Sort's exact operand set vs a packed variant (pad+small
    key packed into one word, key-payload dedup)
 3. f64 -> u32[...,2] bitcast probe (skill says f64 bitcast fails;
    VERDICT #3 wants f64 in the compaction/merge kernels)
 4. monotone-gather decomposition probe: compact+spread vs XLA gather

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_sort.py
"""
import sys
import time

import numpy as np


def timed(fn, args, iters=8, perturb=None, compile_out=None):
    """``compile_out``: optional list; the first warmup's wall seconds
    (compile + first run) are appended to it — bench_configs.py uses
    this for compile-budget enforcement."""
    import jax
    import jax.numpy as jnp

    if perturb is None:
        perturb = lambda a, c: [a[0] + c.astype(a[0].dtype)] + list(a[1:])

    def chained(args):
        def body(carry, _):
            out = fn(*perturb(args, carry))
            s = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                flat = leaf.ravel().astype(jnp.float32)
                w = (jnp.arange(flat.shape[0]) % 13).astype(jnp.float32)
                s = s + jnp.dot(flat, w)
            return (s * 1e-30).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    jrun = jax.jit(chained)
    t0 = time.perf_counter()
    np.asarray(jrun(args))
    if compile_out is not None:
        compile_out.append(time.perf_counter() - t0)
    noop = jax.jit(lambda x: x + 1)
    np.asarray(noop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(noop(jnp.float32(0)))
    rpc = (time.perf_counter() - t0) / 3
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jrun(args))
        best = min(best, time.perf_counter() - t0)
    return max((best - rpc) / iters, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    N = 8_000_000
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.integers(0, 64, N).astype(np.int32))
    v = jnp.asarray(rng.random(N, dtype=np.float32))
    fk = jnp.asarray(rng.integers(0, 1_000_000, N).astype(np.int32))
    pad = jnp.zeros(N, jnp.int32)

    # --- 3. f64 bitcast probe (cheap, do first) ---
    try:
        x = jnp.asarray(rng.random(4).astype(np.float64))
        w = jax.jit(lambda x: jax.lax.bitcast_convert_type(
            x, jnp.uint32).sum(dtype=jnp.uint32))(x)
        print(f"f64->u32 bitcast: OK ({np.asarray(w)})", flush=True)
    except Exception as e:
        print(f"f64->u32 bitcast: FAIL ({type(e).__name__}: {str(e)[:120]})",
              flush=True)

    # --- 1. raw lax.sort operand scaling ---
    def srt(nk, *ops):
        return jax.lax.sort(list(ops), num_keys=nk, is_stable=True)

    import functools
    for label, nk, ops in [
        ("sort [g,v] 2k+0p", 2, [g, v]),
        ("sort [pad,g,v] 3k+0p", 3, [pad, g, v]),
        ("sort [pad,g,v]+fk 3k+1p", 3, [pad, g, v, fk]),
        ("sort [pad,g,v]+fk,v,g 3k+3p", 3, [pad, g, v, fk, v, g]),
        ("sort [gpack,v]+fk 2k+1p", 2, [g * 33554432 + pad, v, fk]),
    ]:
        secs = timed(functools.partial(srt, nk), ops)
        print(f"{label:<28} {secs*1e3:8.2f} ms", flush=True)

    # --- 2. the Sort operator end-to-end for the bench shape ---
    sys.path.insert(0, "/root/repo")
    from supersonic_tpu import (DataType, ScanTable, Sort, Table,
                                TupleSchema)
    from supersonic_tpu.ops.base import compile_plan

    fact = Table.from_data(
        TupleSchema.of(("fk", DataType.INT32, False),
                       ("v", DataType.FLOAT, False),
                       ("g", DataType.INT32, False)),
        {"fk": np.asarray(fk), "v": np.asarray(v), "g": np.asarray(g)})
    run, bound, leaves = compile_plan(
        Sort([("g", True), ("v", False)], ScanTable(fact)))

    def oprun(t):
        out, flags = run([t] + leaves[1:])
        return [c.values for c in out.columns.values()]

    def perturb_t(args, c):
        t = args[0]
        vcol = t.columns["v"]
        t2 = Table(t.schema,
                   {**t.columns, "v": vcol._replace(values=vcol.values + c)},
                   t.num_rows, t.dicts)
        return [t2]

    secs = timed(oprun, [leaves[0]], perturb=perturb_t)
    print(f"{'Sort op end-to-end':<28} {secs*1e3:8.2f} ms", flush=True)

    # --- 4. monotone gather: XLA gather vs compact+spread decomposition
    # dst[i] = src[idx[i]] with idx sorted (the dup8 rhs pattern after
    # probe sort) ---
    M = 1_000_000
    src = jnp.asarray(rng.integers(0, 1 << 30, M).astype(np.int32))
    idx_np = np.sort(rng.integers(0, M, N)).astype(np.int32)
    idx = jnp.asarray(idx_np)

    def xla_gather(idx, src):
        return src[idx]

    secs = timed(xla_gather, [idx, src],
                 perturb=lambda a, c: [a[0] + c.astype(jnp.int32) * 0,
                                       a[1] + c.astype(jnp.int32)])
    print(f"{'XLA gather 8M monotone':<28} {secs*1e3:8.2f} ms", flush=True)

    # random for contrast
    ridx = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
    secs = timed(xla_gather, [ridx, src],
                 perturb=lambda a, c: [a[0] + c.astype(jnp.int32) * 0,
                                       a[1] + c.astype(jnp.int32)])
    print(f"{'XLA gather 8M random':<28} {secs*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
