"""Raw gather costs on the chip with NON-hoistable indices.

The chained harness must perturb the *indices* each iteration, else XLA
hoists the gather out of the scan and the number is fiction.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 8_000_000
K = 1_000_000
ITERS = 8


def timed(label, fn, *args):
    def chained(*args):
        def body(carry, _):
            r = fn(carry, *args)
            return r.astype(jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    jrun = jax.jit(chained)
    np.asarray(jrun(*args))
    noop = jax.jit(lambda x: x + 1)
    np.asarray(noop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(noop(jnp.float32(0)))
    rpc = (time.perf_counter() - t0) / 3
    best = min(
        (lambda t0=time.perf_counter(): (np.asarray(jrun(*args)),
                                         time.perf_counter() - t0)[1])()
        for _ in range(3))
    print(f"{label:58s} {(best - rpc)/ITERS*1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, K, N).astype(np.int32))
    lut1 = jnp.asarray(rng.random(K, np.float32))
    lut2 = jnp.stack([lut1, lut1 + 1], axis=1)
    lut4 = jnp.concatenate([lut2, lut2], axis=1)

    # carry-perturbed index defeats hoisting (carry is data-dependent)
    def pert(carry, idx):
        return idx + (carry > 1e30).astype(jnp.int32)

    timed("take [1M] f32, 8M idx (1 lane)",
          lambda c, idx, l: jnp.take(l, pert(c, idx)).sum(), idx, lut1)
    timed("take [1M,2] f32, 8M idx (2 lanes packed)",
          lambda c, idx, l: jnp.take(l, pert(c, idx), axis=0).sum(),
          idx, lut2)
    timed("take [1M,4] f32, 8M idx (4 lanes packed)",
          lambda c, idx, l: jnp.take(l, pert(c, idx), axis=0).sum(),
          idx, lut4)
    timed("take [8k] f32, 8M idx (XLA)",
          lambda c, idx, l: jnp.take(l[:8192], pert(c, idx) % 8192).sum(),
          idx, lut1)
    from supersonic_tpu.kernels.lut_gather import lut_gather
    timed("lut_gather [8k], 8M idx (pallas)",
          lambda c, idx, l: lut_gather([l[:8192]], pert(c, idx) % 8192,
                                       8192)[0].sum(), idx, lut1)
    timed("elementwise i64 sub+cmp 8M",
          lambda c, idx, l: ((idx.astype(jnp.int64)
                              + (c > 1e30).astype(jnp.int64)) * 3
                             % 7).sum().astype(jnp.float32), idx, lut1)
    timed("sort 2M f32 (1 key 1 payload)",
          lambda c, idx, l: jax.lax.sort(
              [jnp.tile(l, 2) + c, jnp.tile(l, 2)], num_keys=1)[1][0],
          idx, lut1)


def extra():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, K, N).astype(np.int32))
    lut1 = jnp.asarray(rng.random(K, np.float32))

    def pert(carry, idx):
        return idx + (carry > 1e30).astype(jnp.int32)

    timed("take [1M,2] DUPLICATED lane",
          lambda c, idx, l: jnp.take(
              jnp.stack([l, l], axis=1), pert(c, idx), axis=0)[:, 0].sum(),
          idx, lut1)
    for lanes in (6, 8, 12):
        lutk = jnp.stack([lut1] * lanes, axis=1)
        timed(f"take [1M,{lanes}] packed",
              lambda c, idx, l: jnp.take(l, pert(c, idx),
                                         axis=0).sum(), idx, lutk)


if __name__ == "__main__":
    import sys

    if "--extra" in sys.argv:
        extra()
    else:
        main()
