"""Verify + time the two-way-transformer implementations on the real chip.

    python scripts/verify_twoway_tpu.py [--queries 64]

Compares the factored production path vs the naive transcription at the
production shape (N queries, P=2048 video tokens, C=1408, bf16) against an
fp32 reference, and times both with the queue-then-sync methodology.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[0], dtype=np.float32))


def time_fn(fn, *args, iters=5):
    _sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=64)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.models.sam import SamConfig, dense_pe, twoway_transformer_apply
    from l4p_tpu.models.track import TrackConfig, init_track_params

    n = args.queries
    sam = SamConfig()
    tcfg = TrackConfig(max_queries=n)
    params32 = init_track_params(tcfg, jax.random.PRNGKey(0), jnp.float32)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params32)
    tw32 = params32["mask_decoder"]["transformer"]
    tw = params["mask_decoder"]["transformer"]

    p, c = sam.num_video_tokens, sam.embed_dim
    key = jax.random.PRNGKey(1)
    img32 = jax.random.normal(key, (n, p, c), jnp.float32) * 0.5
    img = img32.astype(jnp.bfloat16)
    pe = dense_pe(params32["prompt_encoder"], sam)
    pos32 = pe.reshape(1, c, -1).transpose(0, 2, 1)
    pos = pos32.astype(jnp.bfloat16)
    tok32 = jax.random.normal(jax.random.fold_in(key, 1), (n, 6, c), jnp.float32) * 0.5
    tok = tok32.astype(jnp.bfloat16)

    def with_retry(f, *a):
        for attempt in range(3):
            try:
                return f(*a)
            except Exception as e:  # noqa: BLE001 — tunnel UNAVAILABLE is transient
                if attempt == 2 or "UNAVAILABLE" not in str(e):
                    raise
                print(json.dumps({"retry": str(e)[:120]}), flush=True)
                time.sleep(15.0 * (attempt + 1))

    # fp32 reference on an 8-query slice: queries are independent in the
    # two-way transformer (keys are per-query), so the slice is exact — and
    # the full-N fp32 graph once broke the tunnel's remote compile
    nr = min(8, n)
    # inputs must be jit ARGUMENTS: baked-in constants send the compiler
    # into a giant constant-folding pass that wedges the remote compile
    ref_fn = jax.jit(
        lambda tw_, i_, p_, t_: twoway_transformer_apply(tw_, sam, i_, p_, t_, impl="naive")
    )
    ref_q, ref_k = with_retry(ref_fn, tw32, img32[:nr], pos32, tok32[:nr])
    ref_q = np.asarray(ref_q, np.float32)
    ref_k = np.asarray(ref_k, np.float32)

    res = {}
    for impl in ("naive", "factored", "streamed"):
        fn = jax.jit(
            lambda tw_, i_, p_, t_, im=impl: twoway_transformer_apply(tw_, sam, i_, p_, t_, impl=im)
        )
        t0 = time.time()
        q_, k_ = with_retry(fn, tw, img, pos, tok)
        _sync(q_)
        build_s = time.time() - t0
        qn = np.asarray(q_, np.float32)
        kn = np.asarray(k_, np.float32)
        res[impl] = (qn, kn)
        dq = float(np.max(np.abs(qn[:nr] - ref_q)))
        dk = float(np.max(np.abs(kn[:nr] - ref_k)))
        dt = time_fn(fn, tw, img, pos, tok, iters=10)
        print(json.dumps({
            "path": impl,
            "ms": round(dt * 1e3, 2),
            "max_err_queries_vs_fp32": round(dq, 5),
            "max_err_keys_vs_fp32": round(dk, 5),
            "first_call_s": round(build_s, 1),
        }), flush=True)

    for a, b in (("factored", "naive"), ("streamed", "factored")):
        dq = float(np.max(np.abs(res[a][0] - res[b][0])))
        dk = float(np.max(np.abs(res[a][1] - res[b][1])))
        print(json.dumps({f"{a}_vs_{b}_bf16_max_err": {"queries": round(dq, 5),
                                                       "keys": round(dk, 5)}}), flush=True)


if __name__ == "__main__":
    main()
