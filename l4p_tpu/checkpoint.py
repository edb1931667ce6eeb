"""PyTorch-checkpoint -> l4p_tpu param-pytree conversion.

The released weights ship as a single Lightning .ckpt whose `state_dict` keys
are prefixed `l4p_model.` (reference: l4p/models/utils.py:52-53,
weights/download.sh:4). This module maps those names onto our pytrees.
Works from any dict of numpy arrays (torch.load result's state_dict with
tensors converted), so torch is an optional dependency.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from l4p_tpu.models.encoder import EncoderConfig, sinusoid_pos_embed
from l4p_tpu.models.dpt import DPTConfig, _rescale_kind


def _np(x) -> np.ndarray:
    """Accept torch tensors or numpy arrays."""
    if isinstance(x, np.ndarray):
        return x
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def state_dict_to_numpy(state_dict: Mapping) -> Dict[str, np.ndarray]:
    return {k: _np(v) for k, v in state_dict.items()}


class TrackedStateDict:
    """Wraps a state dict to record which keys the converters consumed, so
    `convert_l4p` can enforce the reference's strict-load contract
    (load_state_dict strict=True, reference l4p/models/utils.py:52-53):
    an unexpected layout must error loudly, never degrade silently."""

    def __init__(self, sd: Mapping[str, np.ndarray]):
        self._sd = sd
        self.consumed: set = set()

    def __getitem__(self, k):
        try:
            v = self._sd[k]
        except KeyError:
            raise KeyError(
                f"checkpoint is missing key '{k}' required by the model config "
                "(strict load, reference utils.py:52-53). If this is an "
                "encoder-only/partial checkpoint use the lenient loader "
                "(config.load_video_encoder_ckpt), or pass strict=False."
            ) from None
        self.consumed.add(k)
        return v

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def keys(self):
        return self._sd.keys()

    def unconsumed(self):
        return sorted(set(self._sd.keys()) - self.consumed)


def convert_encoder(sd: Mapping[str, np.ndarray], cfg: EncoderConfig, prefix: str = "", dtype=jnp.float32) -> Dict:
    """Convert VideoMAE encoder weights.

    Torch module tree (modeling_pretrain.py:32-99): patch_embed.proj,
    blocks.{i}.{norm1,attn.{qkv,q_bias,v_bias,proj},norm2,mlp.{fc1,fc2}}, norm.
    pos_embed is a non-persistent sinusoid table (modeling_pretrain.py:77) —
    recomputed, never loaded.
    """
    g = lambda k: _np(sd[prefix + k])
    e = cfg.embed_dim
    d = cfg.depth

    def stack(key_fmt, reshape=None):
        arrs = [g(key_fmt.format(i)) for i in range(d)]
        if reshape is not None:
            arrs = [a.reshape(reshape) for a in arrs]
        return jnp.asarray(np.stack(arrs), dtype)

    params = {
        "patch_embed": {
            "weight": jnp.asarray(g("patch_embed.proj.weight").reshape(e, -1), dtype),
            "bias": jnp.asarray(g("patch_embed.proj.bias"), dtype),
        },
        "pos_embed": jnp.asarray(sinusoid_pos_embed(cfg.num_tokens, e), dtype),
        "blocks": {
            "norm1_w": stack("blocks.{}.norm1.weight"),
            "norm1_b": stack("blocks.{}.norm1.bias"),
            # fused (3E, E) -> head-aligned (3, E, E) for TP sharding
            "qkv_w": stack("blocks.{}.attn.qkv.weight", reshape=(3, e, e)),
            "q_bias": stack("blocks.{}.attn.q_bias"),
            "v_bias": stack("blocks.{}.attn.v_bias"),
            "proj_w": stack("blocks.{}.attn.proj.weight"),
            "proj_b": stack("blocks.{}.attn.proj.bias"),
            "norm2_w": stack("blocks.{}.norm2.weight"),
            "norm2_b": stack("blocks.{}.norm2.bias"),
            "fc1_w": stack("blocks.{}.mlp.fc1.weight"),
            "fc1_b": stack("blocks.{}.mlp.fc1.bias"),
            "fc2_w": stack("blocks.{}.mlp.fc2.weight"),
            "fc2_b": stack("blocks.{}.mlp.fc2.bias"),
        },
        "norm": {
            "weight": jnp.asarray(g("norm.weight"), dtype),
            "bias": jnp.asarray(g("norm.bias"), dtype),
        },
    }
    if cfg.cos_attn:
        params["blocks"]["attn_scale"] = stack("blocks.{}.attn.scale")
    if cfg.init_values > 0:
        # LayerScale gammas exist in the ckpt iff the model was built with
        # init_values > 0 (modeling_finetune.py:239-243); a config mismatch
        # surfaces as missing/unconsumed keys under the strict loader
        params["blocks"]["gamma_1"] = stack("blocks.{}.gamma_1")
        params["blocks"]["gamma_2"] = stack("blocks.{}.gamma_2")
    if cfg.use_learnable_pos_emb and (prefix + "pos_embed") in sd:
        params["pos_embed"] = jnp.asarray(g("pos_embed")[:, : cfg.num_tokens], dtype)
    if cfg.cam_emb_placed_at is not None:
        params["cam_emb"] = {
            "weight": jnp.asarray(g("cam_emb.cam_emb_proj.weight"), dtype),
            "bias": jnp.asarray(g("cam_emb.cam_emb_proj.bias"), dtype),
        }
    return params


def convert_encoder_lenient(
    sd: Mapping[str, np.ndarray],
    cfg: EncoderConfig,
    init_params: Dict,
    prefix: str = "",
    dtype=jnp.float32,
) -> Dict:
    """`load_state_dict(ckpt, strict=False)` analog for encoder-only init
    (reference l4p_videomae.py:187-191): overlay whatever encoder tensors the
    checkpoint provides onto `init_params`, keeping init values for anything
    missing and ignoring extra keys (e.g. an MAE decoder). A stacked-blocks
    entry loads only when every per-block tensor is present."""
    g = lambda k: _np(sd[prefix + k])
    has = lambda k: (prefix + k) in sd
    d, e = cfg.depth, cfg.embed_dim

    out = dict(init_params)
    pe = dict(init_params["patch_embed"])
    if has("patch_embed.proj.weight"):
        pe["weight"] = jnp.asarray(g("patch_embed.proj.weight").reshape(e, -1), dtype)
    if has("patch_embed.proj.bias"):
        pe["bias"] = jnp.asarray(g("patch_embed.proj.bias"), dtype)
    out["patch_embed"] = pe

    blocks = dict(init_params["blocks"])

    def try_stack(ours: str, fmt: str, reshape=None):
        keys = [fmt.format(i) for i in range(d)]
        if all(has(k) for k in keys):
            arrs = [g(k) for k in keys]
            if reshape is not None:
                arrs = [a.reshape(reshape) for a in arrs]
            blocks[ours] = jnp.asarray(np.stack(arrs), dtype)

    try_stack("norm1_w", "blocks.{}.norm1.weight")
    try_stack("norm1_b", "blocks.{}.norm1.bias")
    try_stack("qkv_w", "blocks.{}.attn.qkv.weight", reshape=(3, e, e))
    try_stack("q_bias", "blocks.{}.attn.q_bias")
    try_stack("v_bias", "blocks.{}.attn.v_bias")
    try_stack("proj_w", "blocks.{}.attn.proj.weight")
    try_stack("proj_b", "blocks.{}.attn.proj.bias")
    try_stack("norm2_w", "blocks.{}.norm2.weight")
    try_stack("norm2_b", "blocks.{}.norm2.bias")
    try_stack("fc1_w", "blocks.{}.mlp.fc1.weight")
    try_stack("fc1_b", "blocks.{}.mlp.fc1.bias")
    try_stack("fc2_w", "blocks.{}.mlp.fc2.weight")
    try_stack("fc2_b", "blocks.{}.mlp.fc2.bias")
    if cfg.cos_attn:
        try_stack("attn_scale", "blocks.{}.attn.scale")
    if cfg.init_values > 0:
        try_stack("gamma_1", "blocks.{}.gamma_1")
        try_stack("gamma_2", "blocks.{}.gamma_2")
    out["blocks"] = blocks

    norm = dict(init_params["norm"])
    if has("norm.weight"):
        norm["weight"] = jnp.asarray(g("norm.weight"), dtype)
    if has("norm.bias"):
        norm["bias"] = jnp.asarray(g("norm.bias"), dtype)
    out["norm"] = norm

    if cfg.use_learnable_pos_emb and has("pos_embed"):
        out["pos_embed"] = jnp.asarray(g("pos_embed")[:, : cfg.num_tokens], dtype)
    if cfg.cam_emb_placed_at is not None and has("cam_emb.cam_emb_proj.weight"):
        out["cam_emb"] = {
            "weight": jnp.asarray(g("cam_emb.cam_emb_proj.weight"), dtype),
            "bias": jnp.asarray(g("cam_emb.cam_emb_proj.bias"), dtype),
        }
    return out


def convert_mae(sd: Mapping[str, np.ndarray], cfg, prefix: str = "", dtype=jnp.float32) -> Dict:
    """Convert a PretrainVisionTransformer (MAE) checkpoint
    (modeling_pretrain.py:246-328). cfg: l4p_tpu.models.mae.MAEConfig."""
    from l4p_tpu.models.mae import MAEConfig  # local import to avoid cycle

    assert isinstance(cfg, MAEConfig)
    g = lambda k: _np(sd[prefix + k])
    enc = convert_encoder(sd, cfg.encoder, prefix=prefix + "encoder.", dtype=dtype)
    dec_cfg = cfg.decoder_cfg
    d = dec_cfg.depth

    de_dim = cfg.decoder_embed_dim

    def stack(key_fmt, reshape=None):
        arrs = [g(key_fmt.format(i)) for i in range(d)]
        if reshape is not None:
            arrs = [a.reshape(reshape) for a in arrs]
        return jnp.asarray(np.stack(arrs), dtype)

    decoder = {
        "blocks": {
            "norm1_w": stack("decoder.blocks.{}.norm1.weight"),
            "norm1_b": stack("decoder.blocks.{}.norm1.bias"),
            "qkv_w": stack("decoder.blocks.{}.attn.qkv.weight", reshape=(3, de_dim, de_dim)),
            "q_bias": stack("decoder.blocks.{}.attn.q_bias"),
            "v_bias": stack("decoder.blocks.{}.attn.v_bias"),
            "proj_w": stack("decoder.blocks.{}.attn.proj.weight"),
            "proj_b": stack("decoder.blocks.{}.attn.proj.bias"),
            "norm2_w": stack("decoder.blocks.{}.norm2.weight"),
            "norm2_b": stack("decoder.blocks.{}.norm2.bias"),
            "fc1_w": stack("decoder.blocks.{}.mlp.fc1.weight"),
            "fc1_b": stack("decoder.blocks.{}.mlp.fc1.bias"),
            "fc2_w": stack("decoder.blocks.{}.mlp.fc2.weight"),
            "fc2_b": stack("decoder.blocks.{}.mlp.fc2.bias"),
        },
        "norm": {"weight": jnp.asarray(g("decoder.norm.weight"), dtype),
                 "bias": jnp.asarray(g("decoder.norm.bias"), dtype)},
    }
    from l4p_tpu.models.encoder import sinusoid_pos_embed as _spe

    return {
        "encoder": enc,
        "decoder": decoder,
        "encoder_to_decoder": {"weight": jnp.asarray(g("encoder_to_decoder.weight"), dtype)},
        "mask_token": jnp.asarray(g("mask_token"), dtype),
        "decoder_pos_embed": jnp.asarray(_spe(cfg.encoder.num_tokens, cfg.decoder_embed_dim), dtype),
        "decoder_head": {
            "weight": jnp.asarray(g("decoder.head.weight"), dtype),
            "bias": jnp.asarray(g("decoder.head.bias"), dtype),
        },
    }


def convert_dpt(sd: Mapping[str, np.ndarray], cfg: DPTConfig, prefix: str = "", dtype=jnp.float32) -> Dict:
    """Convert a PixelwiseTaskWithDPT module (prefix up to and including
    'task_head.'). Torch tree: dpt.act_postprocess.{i}.{0,1},
    dpt.scratch.layer{1-4}_rn, dpt.scratch.refinenet{1-4}.*, dpt.head1.0,
    dpt.head2.{0,2} (dpt_head.py:89-115, dpt_block.py:371-509)."""
    g = lambda k: jnp.asarray(_np(sd[prefix + k]), dtype)

    def conv(k, bias=True):
        p = {"weight": g(k + ".weight")}
        if bias:
            p["bias"] = g(k + ".bias")
        return p

    act = []
    for i, sf in enumerate(cfg.actpost_scale_factors):
        entry = {"proj": conv(f"dpt.act_postprocess.{i}.0")}
        if _rescale_kind(sf) != "id":
            entry["rescale"] = conv(f"dpt.act_postprocess.{i}.1")
        act.append(entry)

    def resunit(k):
        return {"conv1": conv(k + ".conv1"), "conv2": conv(k + ".conv2")}

    refinenet = [
        {
            "resConfUnit1": resunit(f"dpt.scratch.refinenet{i + 1}.resConfUnit1"),
            "resConfUnit2": resunit(f"dpt.scratch.refinenet{i + 1}.resConfUnit2"),
            "out_conv": conv(f"dpt.scratch.refinenet{i + 1}.out_conv"),
        }
        for i in range(4)
    ]
    layer_rn = [conv(f"dpt.scratch.layer{i + 1}_rn", bias=False) for i in range(4)]
    # the reference registers these convs twice — layer{i}_rn and a
    # `scratch.layer_rn` ModuleList alias of the SAME modules
    # (dpt_block.py:44-85) — so the state_dict carries duplicate keys;
    # touch the alias names so the strict loader sees them consumed
    for i in range(4):
        alias = prefix + f"dpt.scratch.layer_rn.{i}.weight"
        if alias in sd:
            sd[alias]
    return {
        "act_postprocess": act,
        "layer_rn": layer_rn,
        "refinenet": refinenet,
        "head1": conv("dpt.head1.0"),
        "head2_0": conv("dpt.head2.0"),
        "head2_2": conv("dpt.head2.2"),
    }


def convert_track_head(sd: Mapping[str, np.ndarray], prefix: str = "", dtype=jnp.float32,
                       sam_depth: int = 2, num_mask_tokens: int = 3,
                       num_point_embeddings: int = 2, prompt_using_features: bool = True,
                       attend_to_past: bool = True) -> Dict:
    """Convert VideoMAETrack2DSamHead weights (sparse_heads.py:19-138,
    sam/*.py). prefix e.g. 'l4p_model.task_heads.track_2d.'."""
    g = lambda k: jnp.asarray(_np(sd[prefix + k]), dtype)

    def lin(k):
        return {"weight": g(k + ".weight"), "bias": g(k + ".bias")}

    def attn(k):
        return {n: lin(f"{k}.{n}") for n in ("q_proj", "k_proj", "v_proj", "out_proj")}

    layers = []
    for i in range(sam_depth):
        base = f"mask_decoder.transformer.layers.{i}"
        layers.append(
            {
                "self_attn": attn(base + ".self_attn"),
                "norm1": lin(base + ".norm1"),
                "cross_attn_token_to_image": attn(base + ".cross_attn_token_to_image"),
                "norm2": lin(base + ".norm2"),
                "mlp": {"lin1": lin(base + ".mlp.lin1"), "lin2": lin(base + ".mlp.lin2")},
                "norm3": lin(base + ".norm3"),
                "norm4": lin(base + ".norm4"),
                "cross_attn_image_to_token": attn(base + ".cross_attn_image_to_token"),
            }
        )

    prompt_encoder = {
        "pe_gaussian": g("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
        "point_embeddings": jnp.stack(
            [g(f"prompt_encoder.point_embeddings.{i}.weight")[0] for i in range(num_point_embeddings)]
        ),
        "not_a_point_embed": g("prompt_encoder.not_a_point_embed.weight")[0],
    }
    if prompt_using_features:
        prompt_encoder["prompt_feature_embeddings"] = jnp.stack(
            [g(f"prompt_encoder.prompt_feature_embeddings.{i}.weight")[0] for i in range(2)]
        )

    params = {
        "prompt_encoder": prompt_encoder,
        "mask_decoder": {
            "mask_tokens": g("mask_decoder.mask_tokens.weight"),
            "transformer": {
                "layers": layers,
                "final_attn_token_to_image": attn("mask_decoder.transformer.final_attn_token_to_image"),
                "norm_final_attn": lin("mask_decoder.transformer.norm_final_attn"),
            },
            "upscale": {
                "deconv1": lin("mask_decoder.output_upscaling.0"),
                "ln": lin("mask_decoder.output_upscaling.1"),
                "deconv2": lin("mask_decoder.output_upscaling.3"),
            },
            "hypernet": [
                {
                    "layers": [
                        lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}") for j in range(3)
                    ]
                }
                for i in range(num_mask_tokens)
            ],
        },
    }
    if prompt_using_features:
        params["prompt_feature_linear"] = lin("prompt_feature_linear_layer")
    if attend_to_past:
        params["processed_video_mask_token"] = g("processed_video_mask_token.weight")[0]
        params["processed_video_features_proj"] = lin("processed_video_features_proj")
    # dead SAM leftovers: instantiated but never referenced by the video
    # forward (reference sam/mask_decoder.py:49, sam/prompt_encoder.py:65) —
    # present in checkpoints; consume so the strict loader accepts them
    for dead in ("mask_decoder.iou_token.weight", "prompt_encoder.no_mask_embed.weight"):
        if (prefix + dead) in sd:
            sd[prefix + dead]
    return params
