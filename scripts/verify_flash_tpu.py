"""On-hardware verification of the Pallas flash-attention kernel.

Run on the real TPU (not under tests/conftest.py which forces CPU):

    python scripts/verify_flash_tpu.py

Checks, at the ViT-giant encoder shape (B=1, H=16, N=2048, D=88):
  1. correctness: kernel output vs the XLA `mha` fallback (bf16 + fp32)
  2. speed: kernel vs `mha` wall time per attention call
  3. end-to-end: one full encoder window with use_flash_attention on/off

Prints one JSON line per section. Timing forces device->host transfers
(the axon platform's block_until_ready does not synchronize).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _sync(x) -> float:
    # Slice to a scalar ON DEVICE, then pull: np.asarray on the full array
    # would ship megabytes through the axon tunnel and dominate the timing.
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[0], dtype=np.float32))


def time_fn(fn, *args, iters=10):
    """Queue `iters` async dispatches, sync once at the end.

    Syncing every call would add the axon tunnel's ~29 ms device->host
    round-trip per iteration and swamp sub-50ms kernels; dispatch without
    sync costs ~1.5 ms. The TPU core executes queued programs serially, so
    wall time over the whole queue divided by iters is the true per-call
    device time (plus ~1.5 ms dispatch overhead).
    """
    _sync(fn(*args))  # compile + warm
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def main():
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.ops.attention import mha
    from l4p_tpu.ops.flash_attention import flash_attention, _on_tpu

    dev = jax.devices()[0]
    print(json.dumps({"section": "env", "device": str(dev),
                      "platform": getattr(dev, "platform", "?"),
                      "default_backend": jax.default_backend(),
                      "on_tpu_gate": _on_tpu()}))

    b, h, n, d = 1, 16, 2048, 88
    scale = d ** -0.5
    key = jax.random.PRNGKey(0)

    # fp32 reference at highest precision (the TPU MXU otherwise multiplies
    # fp32 operands at bf16 precision, which would dominate the comparison)
    with jax.default_matmul_precision("highest"):
        qf = jax.random.normal(key, (b, h, n, d), jnp.float32)
        kf = jax.random.normal(jax.random.fold_in(key, 1), (b, h, n, d), jnp.float32)
        vf = jax.random.normal(jax.random.fold_in(key, 2), (b, h, n, d), jnp.float32)
        ref32 = np.asarray(mha(qf, kf, vf, scale), dtype=np.float32)
    for dtype, tol in ((jnp.float32, 5e-3), (jnp.bfloat16, 2e-2)):
        q, k, v = (x.astype(dtype) for x in (qf, kf, vf))
        out = np.asarray(flash_attention(q, k, v, scale), dtype=np.float32)
        err = float(np.max(np.abs(out - ref32)))
        ok = bool(err <= tol)
        print(json.dumps({"section": "correctness", "dtype": str(dtype.__name__),
                          "max_abs_err": err, "tol": tol, "ok": ok}))
        assert ok, f"flash kernel mismatch at {dtype}: {err} > {tol}"

    # kernel-level speed (bf16, giant shape)
    q = jax.random.normal(key, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, n, d), jnp.bfloat16)
    mha_j = jax.jit(lambda a, b_, c: mha(a, b_, c, scale))
    fla_j = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, scale))
    t_mha = time_fn(mha_j, q, k, v, iters=30)
    t_fla = time_fn(fla_j, q, k, v, iters=30)
    print(json.dumps({"section": "kernel_speed", "mha_ms": round(t_mha * 1e3, 3),
                      "flash_ms": round(t_fla * 1e3, 3),
                      "speedup": round(t_mha / t_fla, 2)}))

    # full encoder window, flash on vs off
    import dataclasses

    from l4p_tpu.models.encoder import GIANT, encoder_apply, init_encoder_params

    params = init_encoder_params(GIANT, jax.random.PRNGKey(0), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 224, 224), jnp.bfloat16)

    results = {}
    outs = {}
    for flash in (False, True):
        cfg = dataclasses.replace(GIANT, use_flash_attention=flash)
        fwd = jax.jit(lambda p, xx, c=cfg: encoder_apply(p, xx, c)["final"])
        results[flash] = time_fn(fwd, params, x, iters=5)
        outs[flash] = np.asarray(fwd(params, x), dtype=np.float32)
    e2e_err = float(np.max(np.abs(outs[True] - outs[False])))
    print(json.dumps({"section": "encoder_window",
                      "xla_ms": round(results[False] * 1e3, 1),
                      "flash_ms": round(results[True] * 1e3, 1),
                      "speedup": round(results[False] / results[True], 2),
                      "final_feature_max_abs_diff": e2e_err}))


if __name__ == "__main__":
    main()
