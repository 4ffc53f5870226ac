"""Spread (monotone run expansion) kernel tests — kernels/spread.py,
the inverse of the compaction kernel; drives the NOT_UNIQUE join
expansion on TPU (interpret mode on the CPU test backend)."""
import numpy as np
import pytest

import jax.numpy as jnp

from supersonic_tpu.kernels.spread import TILE, spread_kernel


@pytest.mark.parametrize("n_out,max_eff,seed", [
    (TILE + 5000, 3, 0),
    (2 * TILE, 1, 1),
    (TILE, 50, 2),
    (90000, 8, 3),
    (40000, 1000, 4),
])
def test_spread_matches_repeat(n_out, max_eff, seed):
    rng = np.random.default_rng(seed)
    effs = []
    total = 0
    while total < n_out:
        e = int(rng.integers(1, max_eff + 1))
        effs.append(e)
        total += e
    eff = np.array(effs)
    base = np.concatenate([[0], np.cumsum(eff)])[:-1].astype(np.int32)
    src1 = rng.integers(0, 1 << 30, len(eff)).astype(np.int32)
    src2 = rng.random(len(eff)).astype(np.float32)
    outs = spread_kernel([jnp.asarray(src1), jnp.asarray(src2)],
                         jnp.asarray(base), n_out)
    want1 = np.repeat(src1, eff)[:n_out]
    want2 = np.repeat(src2, eff)[:n_out]
    np.testing.assert_array_equal(np.asarray(outs[0])[:len(want1)], want1)
    np.testing.assert_array_equal(np.asarray(outs[1])[:len(want2)], want2)
