"""Bitonic merge kernel tests — kernels/merge_sorted.py (interpret mode
on the CPU test backend; MergeUnionAll routes through it on TPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from supersonic_tpu.kernels.merge_sorted import TILE, merge_sorted


@pytest.mark.parametrize("na,nb,kr,seed", [
    (40000, 50000, 100, 0),      # heavy ties
    (TILE, TILE, 5, 1),          # exact tiles, extreme ties
    (70000, 3, 10**6, 2),        # wildly uneven
    (100000, 99999, 37, 3),
])
def test_merge_matches_total_order(na, nb, kr, seed):
    rng = np.random.default_rng(seed)
    ka = np.sort(rng.integers(0, kr, na).astype(np.int32))
    kb = np.sort(rng.integers(0, kr, nb).astype(np.int32))
    pa = rng.integers(0, 1 << 30, na).astype(np.int32)
    pb = rng.integers(0, 1 << 30, nb).astype(np.int32)
    (mk,), (mp,) = merge_sorted([jnp.asarray(ka)], [jnp.asarray(pa)],
                                [jnp.asarray(kb)], [jnp.asarray(pb)],
                                na + nb)
    mk, mp = np.asarray(mk), np.asarray(mp)
    allk = np.concatenate([ka, kb])
    side = np.concatenate([np.zeros(na), np.ones(nb)])
    posn = np.concatenate([np.arange(na), np.arange(nb)])
    order = np.lexsort((posn, side, allk))  # (key, side, position)
    np.testing.assert_array_equal(mk[:na + nb], allk[order])
    np.testing.assert_array_equal(mp[:na + nb],
                                  np.concatenate([pa, pb])[order])
