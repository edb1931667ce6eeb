"""Break the tracked window's cost into its sub-blocks on the real chip.

    python scripts/profile_track.py [--queries 64 128]

VERDICT r3: the N=128 track window costs ~93 ms — the headline operating
point's dominant consumer. This script times, per query count: the full
single-window forward, the two-way transformer, the fused upscale+hypernet
kernel (and its XLA fallback), the xy softargmax readout, and the
attend_to_past memory projection — each against its analytic matmul FLOPs
(utils/flops.py) so the MFU column says which block to attack.
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


def _sync(x) -> float:
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[0], dtype=np.float32))


def time_fn(fn, *args, iters=10):
    _sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.models.sam import SamConfig, dense_pe, mask_decoder_apply, twoway_transformer_apply
    from l4p_tpu.models.track import (
        TrackConfig, init_track_params, softargmax_xy, track_forward,
    )
    from l4p_tpu.ops.conv import linear
    from l4p_tpu.ops.fused_upscale import _upscale_xla, fused_upscale_hypernet
    from l4p_tpu.ops.resize import interpolate_trilinear
    from l4p_tpu.utils.flops import device_peak_flops, track_window_flops, twoway_flops, upscale_flops

    peak = device_peak_flops()

    def rep(name, seconds, flops=None, **extra):
        row = {"point": name, "ms": round(seconds * 1e3, 2), **extra}
        if flops is not None and peak:
            row["mfu"] = round(flops / seconds / peak, 3)
        print(json.dumps(row), flush=True)

    for n in args.queries:
        sam = SamConfig()
        tcfg = TrackConfig(max_queries=n)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16),
            init_track_params(tcfg, jax.random.PRNGKey(0), jnp.float32),
        )
        p, c = sam.num_video_tokens, sam.embed_dim
        key = jax.random.PRNGKey(1)
        enc = (jax.random.normal(key, (1, n, p, c), jnp.float32) * 0.5).astype(jnp.bfloat16)
        rng = np.random.default_rng(0)
        q = np.stack([np.zeros(n) + 0.5, rng.uniform(4, 220, n), rng.uniform(4, 220, n)], -1)
        queries = jnp.asarray(q[None].astype(np.float32))
        labels = jnp.ones((1, n), jnp.float32)
        pf = jnp.zeros((1, n, c), jnp.bfloat16)
        pfl = jnp.zeros((1, n), jnp.float32)

        # full single-window forward (per-query enc features, as in the scan)
        fwd = jax.jit(lambda e, qq, ll, f, fl: track_forward(params, tcfg, e, qq, ll, f, fl))
        dt = time_fn(fwd, enc, queries, labels, pf, pfl, iters=args.iters)
        rep(f"track_window n={n}", dt, track_window_flops(tcfg, n))

        # two-way transformer alone
        tw = params["mask_decoder"]["transformer"]
        pe = dense_pe(params["prompt_encoder"], sam)
        pos = pe.reshape(1, c, -1).transpose(0, 2, 1).astype(jnp.bfloat16)
        tok = (jax.random.normal(jax.random.fold_in(key, 1), (n, 6, c), jnp.float32) * 0.5).astype(jnp.bfloat16)
        tw_fn = jax.jit(lambda t_, i_, p_, k_: twoway_transformer_apply(t_, sam, i_, p_, k_))
        dt = time_fn(tw_fn, tw, enc[0], pos, tok, iters=args.iters)
        rep(f"twoway_factored n={n}", dt, twoway_flops(sam, n))

        # upscale+hypernet: fused kernel vs XLA fallback
        up = params["mask_decoder"]["upscale"]
        hyper = (jax.random.normal(jax.random.fold_in(key, 2), (n, 3, sam.decode_dims[1]),
                                   jnp.float32) * 0.5).astype(jnp.bfloat16)
        ker_fn = jax.jit(lambda s_, h_: fused_upscale_hypernet(
            s_, up["deconv1"]["weight"], up["deconv1"]["bias"],
            up["ln"]["weight"], up["ln"]["bias"],
            up["deconv2"]["weight"], up["deconv2"]["bias"], h_))
        dt = time_fn(ker_fn, enc[0], hyper, iters=args.iters)
        rep(f"upscale_kernel n={n}", dt, upscale_flops(sam, n))
        xla_fn = jax.jit(lambda s_, h_: _upscale_xla(
            s_, up["deconv1"]["weight"], up["deconv1"]["bias"],
            up["ln"]["weight"], up["ln"]["bias"],
            up["deconv2"]["weight"], up["deconv2"]["bias"], h_))
        try:
            dt = time_fn(xla_fn, enc[0], hyper, iters=args.iters)
            rep(f"upscale_xla n={n}", dt, upscale_flops(sam, n))
        except Exception as e:  # noqa: BLE001 — OOM at N=128 is informative too
            print(json.dumps({"point": f"upscale_xla n={n}", "error": str(e)[:160]}), flush=True)

        # xy softargmax readout (lerp upsample fused into softmax), low-res in
        logits = (jax.random.normal(jax.random.fold_in(key, 3), (n, 16, 64, 64),
                                    jnp.float32)).astype(jnp.float32)

        def _xy(lg):
            from l4p_tpu.ops.misc import largest_divisor_leq

            def one(l1):
                xl = interpolate_trilinear(l1[None], tcfg.image_size, align_corners=False,
                                           method="lerp")
                return softargmax_xy(xl, tcfg.image_size[1:])[0]

            return jax.lax.map(one, lg, batch_size=largest_divisor_leq(n, 32))

        dt = time_fn(jax.jit(_xy), logits, iters=args.iters)
        rep(f"softargmax_xy n={n}", dt)

        # attend_to_past memory projection (C x C over N*P/2 rows)
        mp = params["processed_video_features_proj"]
        kept = enc[0, :, : p // 2]
        mp_fn = jax.jit(lambda k_: linear(k_, mp["weight"], mp["bias"]))
        dt = time_fn(mp_fn, kept, iters=args.iters)
        rep(f"memory_proj n={n}", dt, 2 * n * (p // 2) * c * c)

        # mask decoder end-to-end (twoway + upscale + unpack transpose)
        md_fn = jax.jit(lambda e_, t_: mask_decoder_apply(
            params["mask_decoder"], sam, e_, pe.astype(jnp.bfloat16), t_))
        dt = time_fn(md_fn, enc[0], tok, iters=args.iters)
        rep(f"mask_decoder n={n}", dt, twoway_flops(sam, n) + upscale_flops(sam, n))


if __name__ == "__main__":
    main()
