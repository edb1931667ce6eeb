"""DPT (dense prediction transformer) decoder — shared trunk of all dense
task heads.

Functional re-design of the reference DPT stack (reference:
l4p/models/task_heads/dpt/dust3r/dpt_head.py:27-115 and
dpt/croco/dpt_block.py:29-509): 4 hook features -> per-level postprocess
(1x1 conv + learned up/down rescale) -> 256-ch projection -> 4 fusion
refinement stages (residual conv units + trilinear upsample) -> regression
head. All convs are 3D (video), NCDHW.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from l4p_tpu.ops.conv import conv3d, conv_transpose3d
from l4p_tpu.ops.resize import interpolate_scale, interpolate_trilinear


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    num_channels: int
    hooks: Tuple[int, ...] = (14, 21, 28, 36)
    layer_dims: Tuple[int, ...] = (256, 512, 1024, 1024)
    feature_dim: int = 256
    last_dim: int = 128
    dim_tokens: int = 1408
    patch_size: Tuple[int, int, int] = (2, 14, 14)
    # reference defaults (dense_heads.py:30-31); camray overrides
    # (dense_heads.py:269-270)
    actpost_scale_factors: Tuple[Tuple[int, int, int], ...] = ((1, 2, 2), (1, 1, 1), (0, 0, 0), (-1, -1, -1))
    fusion_scale_factors: Tuple[Tuple[int, int, int], ...] = ((1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2))
    output_size: Optional[Tuple[int, int, int]] = None  # None -> img_info


def _rescale_kind(sf: Tuple[int, int, int]) -> str:
    """make_conv3d_custom dispatch (dpt_block.py:255-278)."""
    assert all(s >= 0 for s in sf) or all(s <= 0 for s in sf)
    if any(s > 0 for s in sf):
        return "up"
    if any(s < 0 for s in sf):
        return "down"
    return "id"


def _resconv_apply(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """ResidualConvUnit_custom (dpt_block.py:136-157): relu-conv-relu-conv + x."""
    out = jax.nn.relu(x)
    out = conv3d(out, p["conv1"]["weight"], p["conv1"]["bias"], padding=1)
    out = jax.nn.relu(out)
    out = conv3d(out, p["conv2"]["weight"], p["conv2"]["bias"], padding=1)
    return out + x


def _fusion_apply(p: Dict, sf: Tuple[int, int, int], x: jnp.ndarray, res: Optional[jnp.ndarray]) -> jnp.ndarray:
    """FeatureFusionBlock_custom (dpt_block.py:210-238): optional residual
    merge, residual conv unit, trilinear upsample by scale factor
    (align_corners=True), 1x1 out conv."""
    out = x
    if res is not None:
        out = out + _resconv_apply(p["resConfUnit1"], res)
    out = _resconv_apply(p["resConfUnit2"], out)
    out = interpolate_scale(out, sf, align_corners=True)
    out = conv3d(out, p["out_conv"]["weight"], p["out_conv"]["bias"])
    return out


# A full channels-last (NDHWC) dpt_apply variant was built and measured on
# chip this round (scripts/exp_dpt_layout.py history): 27.4 vs 26.5 ms/window
# NCDHW at the giant shape — XLA's TPU layout assignment already converts to
# its preferred tiling either way, so the variant was removed (ROUND_NOTES
# session 6). The in-graph stacked dense heads measure ~70% MFU marginal.


def dpt_apply(
    params: Dict,
    hook_feats: Sequence[jnp.ndarray],
    cfg: DPTConfig,
    img_info: Tuple[int, int, int] = (16, 224, 224),
) -> jnp.ndarray:
    """hook_feats: 4 tensors (B, P, C) at cfg.hooks. Returns
    (B, num_channels, *output) (DPTOutputAdapter_fix.forward,
    dpt_head.py:41-86)."""
    T, H, W = img_info
    nt = T // cfg.patch_size[0]
    nh = H // cfg.patch_size[1]
    nw = W // cfg.patch_size[2]

    layers: List[jnp.ndarray] = []
    for i, feat in enumerate(hook_feats):
        B, P, C = feat.shape
        x = feat.transpose(0, 2, 1).reshape(B, C, nt, nh, nw)
        ap = params["act_postprocess"][i]
        x = conv3d(x, ap["proj"]["weight"], ap["proj"]["bias"])  # 1x1x1 projection
        kind = _rescale_kind(cfg.actpost_scale_factors[i])
        if kind == "up":
            stride = tuple(2 ** s for s in cfg.actpost_scale_factors[i])
            x = conv_transpose3d(x, ap["rescale"]["weight"], ap["rescale"]["bias"], stride=stride)
        elif kind == "down":
            stride = tuple(2 ** (-s) for s in cfg.actpost_scale_factors[i])
            pad = tuple(s // 2 for s in stride)  # kernel size comes from the weight
            x = conv3d(x, ap["rescale"]["weight"], ap["rescale"]["bias"], stride=stride, padding=pad)
        layers.append(x)

    layers = [
        conv3d(l, params["layer_rn"][i]["weight"], None, padding=1) for i, l in enumerate(layers)
    ]

    rn = params["refinenet"]  # index i corresponds to refinenet{i+1}
    path4 = _fusion_apply(rn[3], cfg.fusion_scale_factors[3], layers[3], None)
    # reference crops path_4's dims 2,3 (T and H only) to layers[2]
    # (dpt_head.py:70-72)
    path4 = path4[:, :, : layers[2].shape[2], : layers[2].shape[3]]
    path3 = _fusion_apply(rn[2], cfg.fusion_scale_factors[2], path4, layers[2])
    path2 = _fusion_apply(rn[1], cfg.fusion_scale_factors[1], path3, layers[1])
    path1 = _fusion_apply(rn[0], cfg.fusion_scale_factors[0], path2, layers[0])

    out = conv3d(path1, params["head1"]["weight"], params["head1"]["bias"], padding=1)
    output_size = tuple(img_info) if cfg.output_size is None else tuple(cfg.output_size)
    if tuple(out.shape[-3:]) != output_size:
        out = interpolate_trilinear(out, output_size, align_corners=True)
    out = conv3d(out, params["head2_0"]["weight"], params["head2_0"]["bias"], padding=1)
    out = jax.nn.relu(out)
    out = conv3d(out, params["head2_2"]["weight"], params["head2_2"]["bias"])
    return out


def init_dpt_params(cfg: DPTConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    """Random init with torch-Conv3d-like fan-in scaling (kaiming-uniform)."""
    keys = iter(jax.random.split(key, 128))

    def conv_p(cin, cout, k: Tuple[int, int, int], bias=True, transposed=False):
        fan_in = cin * int(np.prod(k))
        a = float(1.0 / np.sqrt(fan_in))
        shape = (cin, cout, *k) if transposed else (cout, cin, *k)
        p = {"weight": jax.random.uniform(next(keys), shape, dtype, -a, a)}
        if bias:
            p["bias"] = jax.random.uniform(next(keys), (cout,), dtype, -a, a)
        return p

    act = []
    for i, sf in enumerate(cfg.actpost_scale_factors):
        entry = {"proj": conv_p(cfg.dim_tokens, cfg.layer_dims[i], (1, 1, 1))}
        kind = _rescale_kind(sf)
        if kind == "up":
            stride = tuple(2 ** s for s in sf)
            entry["rescale"] = conv_p(cfg.layer_dims[i], cfg.layer_dims[i], stride, transposed=True)
        elif kind == "down":
            stride = tuple(2 ** (-s) for s in sf)
            ksz = tuple((s // 2) * 2 + 1 for s in stride)
            entry["rescale"] = conv_p(cfg.layer_dims[i], cfg.layer_dims[i], ksz)
        act.append(entry)

    f = cfg.feature_dim

    def resunit():
        return {"conv1": conv_p(f, f, (3, 3, 3)), "conv2": conv_p(f, f, (3, 3, 3))}

    refinenet = [
        {"resConfUnit1": resunit(), "resConfUnit2": resunit(), "out_conv": conv_p(f, f, (1, 1, 1))}
        for _ in range(4)
    ]
    return {
        "act_postprocess": act,
        "layer_rn": [conv_p(cfg.layer_dims[i], f, (3, 3, 3), bias=False) for i in range(4)],
        "refinenet": refinenet,
        "head1": conv_p(f, f // 2, (3, 3, 3)),
        "head2_0": conv_p(f // 2, cfg.last_dim, (3, 3, 3)),
        "head2_2": conv_p(cfg.last_dim, cfg.num_channels, (1, 1, 1)),
    }
