"""Pallas TPU kernel: vectorized gather from a SMALL lookup table.

XLA lowers every HBM gather to an element-serial loop (~6ns/index on
v5e — 50-60ms for 8M indices) even when the source is tiny.  For LUTs
that fit in a few VMEM tiles (dictionary transforms, dense-key join
probes over small domains, ENUM decodes) this kernel instead streams
index tiles through VMEM and resolves them with Mosaic's lane-wise
``dynamic_gather`` (``take_along_axis`` axis=1): the 128-entry LUT
block b is broadcast across sublanes and every index with hi==b picks
its lane in one vector op — K/128 passes per tile, all VPU work.

~15-40x faster than the XLA gather for K <= ~4k (measured: 8M indices
from a 2048-entry LUT: 59.5ms XLA -> ~2ms here).

Reference analogue: the per-type LUT transforms of the expression
engine and the dense-key probe of hash_join.cc run through this when
the table is small.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 64
LANES = 128
TILE = SUBLANES * LANES
MAX_ENTRIES = 65536  # hard cap on LUT length routed through the kernel
# The block loop costs ~30µs per 128-entry block per lane (8M indices,
# measured: 4.2/8.5/17ms at 16k/32k/64k x 1 lane); the XLA fallback
# gather is flat ~40ms for 1-8 packed lanes.  The kernel pays off while
# blocks x lanes stays under this budget (512 -> ~17ms, a 2.4x win;
# larger unrolls hit the 16MB scoped-VMEM ceiling).
BLOCK_LANE_BUDGET = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported_dtype(dtype) -> bool:
    return jnp.dtype(dtype).itemsize == 4


def profitable(num_entries: int, nlanes: int, n_idx: int) -> bool:
    """Whether the kernel beats the XLA gather for this shape."""
    kb = _round_up(max(num_entries, 1), LANES) // LANES
    return (num_entries <= MAX_ENTRIES
            and kb * max(nlanes, 1) <= BLOCK_LANE_BUDGET
            and n_idx >= 4 * TILE)


def _kernel(idx_ref, *refs, kb: int, nlanes: int):
    luts = refs[:nlanes]          # each [kb, LANES]
    outs = refs[nlanes:]          # each [SUBLANES, LANES]
    idx = idx_ref[:]
    hi = idx // LANES
    lo = jnp.where((lo_ := idx % LANES) < 0, 0, lo_)

    def step(b, accs):
        mask = hi == b
        new = []
        for j in range(nlanes):
            row = luts[j][b, :]
            row_b = jnp.broadcast_to(row[None, :], idx.shape)
            g = jnp.take_along_axis(row_b, lo, axis=1)
            new.append(jnp.where(mask, g, accs[j]))
        return tuple(new)

    accs = tuple(jnp.zeros(idx.shape, lut.dtype) for lut in luts)
    # full static unroll: a fori_loop variant measured 3.5x slower per
    # block (dynamic sublane reads + carry traffic); BLOCK_LANE_BUDGET
    # bounds the unroll size
    for b in range(kb):
        accs = step(b, accs)
    for j in range(nlanes):
        outs[j][:] = accs[j]


def lut_gather(luts, idx: jnp.ndarray, num_entries: int):
    """``[lut[idx] for lut in luts]`` for small LUTs.

    ``luts``: list of 1-D arrays of length >= num_entries, 32-bit dtypes
    (callers bitcast f32/u32/i32 freely).  ``idx``: int32 indices,
    clamped to [0, num_entries) like ``jnp.take`` mode='clip'.  Returns
    one array per LUT at ``idx``'s length.
    """
    n = idx.shape[0]
    k_pad = _round_up(max(num_entries, 1), LANES)
    kb = k_pad // LANES
    n_pad = _round_up(max(n, 1), TILE)
    idx = jnp.clip(idx.astype(jnp.int32), 0, num_entries - 1)
    if n_pad != n:
        idx = jnp.concatenate([idx, jnp.zeros(n_pad - n, jnp.int32)])
    idx2 = idx.reshape(n_pad // LANES, LANES)
    luts2 = []
    for lut in luts:
        assert supported_dtype(lut.dtype), lut.dtype
        pad = k_pad - lut.shape[0]
        lp = jnp.concatenate([lut, jnp.zeros(pad, lut.dtype)]) if pad > 0 \
            else lut[:k_pad]
        luts2.append(lp.reshape(kb, LANES))
    with jax.enable_x64(False):
        idx_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        lut_spec = pl.BlockSpec((kb, LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            functools.partial(_kernel, kb=kb, nlanes=len(luts)),
            grid=(n_pad // TILE,),
            in_specs=[idx_spec] + [lut_spec] * len(luts),
            out_specs=[idx_spec] * len(luts),
            out_shape=[jax.ShapeDtypeStruct((n_pad // LANES, LANES),
                                            lut.dtype) for lut in luts2],
            interpret=jax.default_backend() == "cpu",
        )(idx2, *luts2)
    return [o.reshape(n_pad)[:n] for o in outs]


def take_small(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ``jnp.take(src, clip(idx))`` on 1-D arrays; uses the
    kernel when profitable (TPU backend, small 32-bit source, enough
    indices to amortize the pallas_call), else the XLA gather."""
    if (src.ndim == 1 and idx.ndim == 1
            and profitable(src.shape[0], 1, idx.shape[0])
            and supported_dtype(src.dtype)
            and jax.default_backend() != "cpu"):
        return lut_gather([src], idx, src.shape[0])[0]
    return jnp.take(src, jnp.clip(idx, 0, src.shape[0] - 1))
