"""Segmented prefix scans over key-sorted rows.

The TPU-native substitute for scatter-based segmented reduction: rows
sorted by group key form contiguous runs, so every per-group aggregate is
a segmented inclusive scan (associative_scan with a reset flag — O(log n)
vectorized passes, no HBM scatter) read off at each run's last row.
Works for any group cardinality and any dtype XLA can add/compare
(including emulated f64), unlike the scatter path (~50ms/8M rows) or the
VMEM-accumulator kernel (f32/i32, small K).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def seg_cumsum(vals: jnp.ndarray, reset: jnp.ndarray) -> jnp.ndarray:
    """Inclusive segmented cumsum; segments restart where reset is True."""

    def combine(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, va + vb), ra | rb

    out, _ = jax.lax.associative_scan(combine, (vals, reset))
    return out


def seg_cummin(vals: jnp.ndarray, reset: jnp.ndarray) -> jnp.ndarray:
    def combine(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, jnp.minimum(va, vb)), ra | rb

    out, _ = jax.lax.associative_scan(combine, (vals, reset))
    return out


def seg_cummax(vals: jnp.ndarray, reset: jnp.ndarray) -> jnp.ndarray:
    def combine(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, jnp.maximum(va, vb)), ra | rb

    out, _ = jax.lax.associative_scan(combine, (vals, reset))
    return out


def seg_carry_first(vals: jnp.ndarray, reset: jnp.ndarray) -> jnp.ndarray:
    """Forward-carry each segment's first value to every row of the run."""

    def combine(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, va), ra | rb

    out, _ = jax.lax.associative_scan(combine, (vals, reset))
    return out
