"""Elementwise activation / guard helpers.

TPU-native equivalents of the reference's l4p/utils/misc.py (apply_fn,
safe_inverse, check_inf_nan) — masked `where` instead of boolean indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_fn(x: jnp.ndarray, fn_type: str = "linear") -> jnp.ndarray:
    """Activation dispatch (reference: l4p/utils/misc.py:11-38)."""
    if fn_type == "log":
        out = jnp.log(x)
    elif fn_type == "exp":
        out = jnp.exp(x)
    elif fn_type == "sigmoid":
        out = jax.nn.sigmoid(x)
    elif fn_type == "linear":
        out = x
    elif fn_type == "inverse":
        eps = 1e-8
        mask = jnp.abs(x) > eps
        out = jnp.where(mask, 1.0 / jnp.where(mask, x, 1.0), 0.0)
    else:
        raise NotImplementedError(f"apply_fn: unknown fn_type {fn_type!r}")
    return out.astype(x.dtype)


def safe_inverse(x: jnp.ndarray, keep_above: float = 0.0) -> jnp.ndarray:
    """Guarded reciprocal: 1/x where x > keep_above else 0
    (reference: l4p/utils/misc.py:48-62)."""
    mask = x > keep_above
    return jnp.where(mask, 1.0 / jnp.where(mask, x, 1.0), 0.0).astype(x.dtype)


def check_inf_nan(x: jnp.ndarray):
    """Returns (found_any, bool map) of NaN/Inf locations
    (reference: l4p/utils/misc.py:41-45)."""
    bad = jnp.logical_or(jnp.isnan(x), jnp.isinf(x))
    return jnp.sum(bad) > 0, bad


def largest_divisor_leq(n: int, pref: int) -> int:
    """Largest integer <= pref that DIVIDES n (static python math, used to
    pick lax.map batch sizes: a non-dividing batch_size makes lax.map compile
    its body TWICE — main chunk + remainder — doubling that body's compile
    cost for nothing)."""
    return max(d for d in range(1, min(pref, n) + 1) if n % d == 0)
