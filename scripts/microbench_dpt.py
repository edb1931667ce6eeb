"""Attribute the dense DPT head's per-window cost on the chip.

Times dpt_apply stage by stage at the giant all-task shape (one window,
one task): pyramid prep (act_postprocess + layer_rn), refinenet fusion
paths, head1, the full-res trilinear upsample, and the head2 chain —
plus isolated probes of the two full-resolution convs. FLOPs are analytic
so each row carries its own MFU.

    python scripts/microbench_dpt.py [--tasks 4]
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

PEAK_TFLOPS = 197.0  # v5e bf16


def _sync(x):
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


def rep(name, sec, gflops=None):
    row = {"stage": name, "ms": round(sec * 1e3, 2)}
    if gflops:
        row["gflops"] = round(gflops, 1)
        row["mfu"] = round(gflops / 1e3 / sec / PEAK_TFLOPS, 3)
    print(json.dumps(row), flush=True)


def conv_gf(voxels, cin, cout, k=27):
    return 2 * voxels * cin * cout * k / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.models.dpt import DPTConfig, dpt_apply, init_dpt_params, _fusion_apply
    from l4p_tpu.ops.conv import conv3d, conv_transpose3d
    from l4p_tpu.ops.resize import interpolate_trilinear

    cfg = DPTConfig(num_channels=1)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        init_dpt_params(cfg, jax.random.PRNGKey(0)),
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    key = jax.random.PRNGKey(1)
    hooks = [
        (jax.random.normal(jax.random.fold_in(key, i), (1, 2048, 1408), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
        for i in range(4)
    ]
    info = (16, 224, 224)

    full = jax.jit(lambda p, h: dpt_apply(p, h, cfg, info))
    rep("dpt_apply full", time_fn(full, params, hooks, iters=args.iters))

    # --- stage 1: pyramid (act_postprocess + layer_rn)
    def pyramid(p, feats):
        from l4p_tpu.models.dpt import _rescale_kind
        nt, nh, nw = 8, 16, 16
        layers = []
        for i, feat in enumerate(feats):
            B, P, C = feat.shape
            x = feat.transpose(0, 2, 1).reshape(B, C, nt, nh, nw)
            apq = p["act_postprocess"][i]
            x = conv3d(x, apq["proj"]["weight"], apq["proj"]["bias"])
            kind = _rescale_kind(cfg.actpost_scale_factors[i])
            if kind == "up":
                stride = tuple(2 ** s for s in cfg.actpost_scale_factors[i])
                x = conv_transpose3d(x, apq["rescale"]["weight"], apq["rescale"]["bias"], stride=stride)
            elif kind == "down":
                stride = tuple(2 ** (-s) for s in cfg.actpost_scale_factors[i])
                pad = tuple(s // 2 for s in stride)
                x = conv3d(x, apq["rescale"]["weight"], apq["rescale"]["bias"], stride=stride, padding=pad)
            layers.append(x)
        return [conv3d(l, p["layer_rn"][i]["weight"], None, padding=1) for i, l in enumerate(layers)]

    pyr = jax.jit(pyramid)
    gf_pyr = (
        2 * 2048 * 1408 * (256 + 512 + 1024 + 1024) / 1e9
        + conv_gf(8 * 32 * 32, 256, 256, 4) + conv_gf(4 * 8 * 8, 1024, 1024, 27)
        + conv_gf(8 * 32 * 32, 256, 256) + conv_gf(8 * 16 * 16, 512, 256)
        + conv_gf(8 * 16 * 16, 1024, 256) + conv_gf(4 * 8 * 8, 1024, 256)
    )
    rep("pyramid (actpost+layer_rn)", time_fn(pyr, params, hooks, iters=args.iters), gf_pyr)
    layers = jax.block_until_ready(pyr(params, hooks))

    # --- stage 2: refinenet paths
    def refine(p, ls):
        rn = p["refinenet"]
        path4 = _fusion_apply(rn[3], cfg.fusion_scale_factors[3], ls[3], None)
        path4 = path4[:, :, : ls[2].shape[2], : ls[2].shape[3]]
        path3 = _fusion_apply(rn[2], cfg.fusion_scale_factors[2], path4, ls[2])
        path2 = _fusion_apply(rn[1], cfg.fusion_scale_factors[1], path3, ls[1])
        return _fusion_apply(rn[0], cfg.fusion_scale_factors[0], path2, ls[0])

    ref = jax.jit(refine)
    gf_refine = (
        2 * conv_gf(4 * 8 * 8, 256, 256) + conv_gf(8 * 16 * 16, 256, 256, 1)
        + 4 * conv_gf(8 * 16 * 16, 256, 256) + conv_gf(8 * 16 * 16, 256, 256, 1)  # path3 (up 2,2,2 from (4,8,8) -> (8,16,16))
        + 4 * conv_gf(8 * 16 * 16, 256, 256) + conv_gf(16 * 32 * 32, 256, 256, 1)  # path2
        + 4 * conv_gf(16 * 32 * 32, 256, 256) + conv_gf(16 * 64 * 64, 256, 256, 1)  # path1
    )
    rep("refinenet (4 fusion paths)", time_fn(ref, params, layers, iters=args.iters), gf_refine)
    path1 = jax.block_until_ready(ref(params, layers))

    # --- stage 3: head1 + upsample + head2
    h1 = jax.jit(lambda p, x: conv3d(x, p["head1"]["weight"], p["head1"]["bias"], padding=1))
    v_p1 = int(np.prod(path1.shape[2:]))
    rep("head1 3^3 conv", time_fn(h1, params, path1, iters=args.iters), conv_gf(v_p1, 256, 128))
    x1 = jax.block_until_ready(h1(params, path1))

    up = jax.jit(lambda x: interpolate_trilinear(x, info, align_corners=True))
    rep("trilinear -> (16,224,224)", time_fn(up, x1, iters=args.iters))
    xu = jax.block_until_ready(up(x1))

    vfull = 16 * 224 * 224

    def head2(p, x):
        out = conv3d(x, p["head2_0"]["weight"], p["head2_0"]["bias"], padding=1)
        out = jax.nn.relu(out)
        return conv3d(out, p["head2_2"]["weight"], p["head2_2"]["bias"])

    h2 = jax.jit(head2)
    gf_h2 = conv_gf(vfull, 128, 128) + conv_gf(vfull, 128, 1, 1)
    rep("head2 (3^3 conv+relu+1x1)", time_fn(h2, params, xu, iters=args.iters), gf_h2)

    h20 = jax.jit(lambda p, x: conv3d(x, p["head2_0"]["weight"], p["head2_0"]["bias"], padding=1))
    rep("head2_0 conv alone", time_fn(h20, params, xu, iters=args.iters), conv_gf(vfull, 128, 128))

    # fused tail: upsample + head2 in ONE jit (lets XLA fuse the lerp)
    tail = jax.jit(lambda p, x: head2(p, interpolate_trilinear(x, info, align_corners=True)))
    rep("up+head2 one jit", time_fn(tail, params, x1, iters=args.iters), gf_h2)


if __name__ == "__main__":
    main()
