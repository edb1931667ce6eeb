"""Probe usable Pallas VMEM on the attached chip.

The fused encoder-block kernel design (round 5) keeps activations + k/v
scratch resident in VMEM and streams weights per grid phase; its budget is
~85-95 MB. v5e physically has 128 MiB VMEM but Mosaic's default scoped
limit is lower — this probes what `vmem_limit_bytes` actually buys us.

    python scripts/probe_vmem.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(scratch_mb: int, limit_mb: int) -> str:
    n_rows = scratch_mb * 1024 * 1024 // (2 * 128)  # bf16, 128 lanes

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        o_ref[0, 0] = jnp.sum(scratch[0, :]).astype(jnp.float32)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((n_rows, 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limit_mb * 1024 * 1024
        ),
    )
    x = jnp.ones((1, 128), jnp.bfloat16)
    try:
        out = jax.jit(f)(x)
        return f"ok sum={float(out[0,0])}"
    except Exception as e:
        return f"FAIL {type(e).__name__}: {str(e)[:300]}"


if __name__ == "__main__":
    for scratch_mb, limit_mb in [(32, 100), (64, 100), (90, 110), (100, 120), (110, 128), (120, 134)]:
        t0 = time.time()
        r = probe(scratch_mb, limit_mb)
        print(f"scratch={scratch_mb}MB limit={limit_mb}MB -> {r}  ({time.time()-t0:.1f}s)", flush=True)
