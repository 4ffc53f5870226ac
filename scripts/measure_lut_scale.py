"""lut_gather kernel scaling vs XLA gather at medium LUT sizes."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from supersonic_tpu.kernels.lut_gather import lut_gather

N = 8_000_000
ITERS = 8

def timed(label, fn, *args):
    def chained(*args):
        def body(c, _):
            return fn(c, *args).astype(jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c
    jrun = jax.jit(chained)
    np.asarray(jrun(*args))
    noop = jax.jit(lambda x: x + 1); np.asarray(noop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(3): np.asarray(noop(jnp.float32(0)))
    rpc = (time.perf_counter() - t0) / 3
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(jrun(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:58s} {(best - rpc)/ITERS*1e3:8.2f} ms")

rng = np.random.default_rng(0)
for K in (16384, 32768, 65536, 131072):
    idx = jnp.asarray(rng.integers(0, K, N).astype(np.int32))
    lut = jnp.asarray(rng.random(K, np.float32))
    pert = lambda c, i: i + (c > 1e30).astype(jnp.int32)
    timed(f"kernel K={K} 1 lane",
          lambda c, i, l: lut_gather([l], pert(c, i), l.shape[0])[0].sum(),
          idx, lut)
    if K <= 65536:
        lut2v = jnp.stack([lut, lut + 1])
        timed(f"kernel K={K} 2 lanes",
              lambda c, i, l2: sum(g.sum() for g in lut_gather(
                  [l2[0], l2[1]], pert(c, i), l2.shape[1])),
              idx, lut2v)
