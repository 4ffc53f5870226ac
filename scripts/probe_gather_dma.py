"""Round-5 experiment (VERDICT r4 next #3): can a Pallas kernel beat
XLA's ~5-6 ns/index random HBM gather by raising memory-level
parallelism itself — many outstanding async single-row DMAs from an
HBM-resident LUT, double-buffered index tiles?

The question every join path rests on: the probe fat-LUT fetch, CSR
fetch, and rhs row fetch are all random HBM gathers at probe/output
scale, measured latency-bound at ~5-6 ns/index for 100K+ entry sources.

Design under test:
  * LUT stays in HBM (pltpu.ANY), laid out [K, 128] (one gather = one
    sublane row of L<=128 lanes — the fat-LUT shape).
  * The kernel loops over its VMEM index tile with a scalar fori_loop,
    issuing ``pltpu.make_async_copy(lut.at[row], slot, sem)`` into W
    rotating VMEM slots; each issue waits the slot's PREVIOUS dma
    first, so up to W copies are outstanding at any time.
  * Gathered rows land in the output tile via the slot buffer.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/probe_gather_dma.py [n_idx_millions]
Prints measured ns/index for the XLA gather and the DMA kernel at
1M/8M indices from 128K/1M-entry sources.  Whatever the outcome, the
measured outstanding-DMA ceiling gets recorded in BASELINE.md.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LANES = 128
TILE_IDX = 2048  # indices handled per grid step


def _kernel(idx_ref, lut_ref, out_ref, slots, sems, *, W: int):
    """Gather lut[idx[i], :] -> out[i, :] with up to W outstanding DMAs."""

    def issue(i, _):
        slot = jax.lax.rem(i, W)
        row = idx_ref[i, 0]

        def wait_prev():
            pltpu.make_async_copy(
                lut_ref.at[pl.ds(idx_ref[i - W, 0], 1), :],
                slots.at[pl.ds(slot, 1), :],
                sems.at[slot]).wait()
            out_ref[pl.ds(i - W, 1), :] = slots[pl.ds(slot, 1), :]

        @pl.when(i >= W)
        def _():
            wait_prev()

        pltpu.make_async_copy(
            lut_ref.at[pl.ds(row, 1), :],
            slots.at[pl.ds(slot, 1), :],
            sems.at[slot]).start()
        return 0

    jax.lax.fori_loop(0, TILE_IDX, issue, 0)

    def drain(i, _):
        slot = jax.lax.rem(i, W)
        pltpu.make_async_copy(
            lut_ref.at[pl.ds(idx_ref[i, 0], 1), :],
            slots.at[pl.ds(slot, 1), :],
            sems.at[slot]).wait()
        out_ref[pl.ds(i, 1), :] = slots[pl.ds(slot, 1), :]
        return 0

    jax.lax.fori_loop(TILE_IDX - W, TILE_IDX, drain, 0)


def dma_gather(lut, idx, W=16):
    n = idx.shape[0]
    n_pad = -(-n // TILE_IDX) * TILE_IDX
    if n_pad != n:
        idx = jnp.concatenate([idx, jnp.zeros(n_pad - n, jnp.int32)])
    idx2 = idx.reshape(n_pad, 1)
    grid = (n_pad // TILE_IDX,)
    out = pl.pallas_call(
        functools.partial(_kernel, W=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_IDX, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # LUT stays in HBM
        ],
        out_specs=pl.BlockSpec((TILE_IDX, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANES), lut.dtype),
        scratch_shapes=[
            pltpu.VMEM((16, LANES), lut.dtype),
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )(idx2, lut)
    return out[:n]


def timeit(tag, f, *args):
    jf = jax.jit(f)
    t0 = time.perf_counter()
    r = jf(*args)
    np.asarray(r)
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jf(*args))
        best = min(best, time.perf_counter() - t0)
    return comp, best


def main():
    rng = np.random.default_rng(0)
    for K in (1 << 17, 1 << 20):
        lut = jnp.asarray(rng.random((K, LANES), dtype=np.float32))
        for n_idx in (1 << 20, 8 << 20):
            idx = jnp.asarray(rng.integers(0, K, n_idx).astype(np.int32))

            def xla(lut, idx):
                g = jnp.take(lut, idx, axis=0)
                w = (jnp.arange(n_idx, dtype=jnp.int32) % 13).astype(
                    jnp.float32)
                return jnp.dot(g[:, 0], w) + g[123, 64]

            comp, best = timeit("xla", xla, lut, idx)
            print(f"XLA gather  K={K:>8} n={n_idx:>9}: "
                  f"{best*1e3:8.2f} ms = {best/n_idx*1e9:6.2f} ns/idx "
                  f"(compile {comp:.1f}s)", flush=True)

            for W in (4, 8, 16):
                def dma(lut, idx, W=W):
                    g = dma_gather(lut, idx, W=W)
                    w = (jnp.arange(n_idx, dtype=jnp.int32) % 13).astype(
                        jnp.float32)
                    return jnp.dot(g[:, 0], w) + g[123, 64]

                try:
                    comp, best = timeit("dma", dma, lut, idx)
                    # correctness spot-check
                    got = np.asarray(jax.jit(
                        lambda l, i: dma_gather(l, i, W=W)[:64, 0])(
                            lut, idx))
                    want = np.asarray(lut)[np.asarray(idx)[:64], 0]
                    ok = np.array_equal(got, want)
                    print(f"DMA gather  K={K:>8} n={n_idx:>9} W={W:>2}: "
                          f"{best*1e3:8.2f} ms = {best/n_idx*1e9:6.2f} "
                          f"ns/idx (compile {comp:.1f}s, "
                          f"correct={ok})", flush=True)
                except Exception as e:
                    print(f"DMA gather  K={K:>8} n={n_idx:>9} W={W:>2}: "
                          f"FAILED: {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)
            break  # one n_idx per K is enough for the law
        print(flush=True)


if __name__ == "__main__":
    main()
