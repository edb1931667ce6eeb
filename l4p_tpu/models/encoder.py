"""Video ViT encoder (VideoMAE-v2-style) — TPU-first functional design.

Re-designs the reference encoder (reference: l4p/models/VideoMAEv2/models/
modeling_finetune.py:137-283, modeling_pretrain.py:32-149, wrapped at
l4p/models/l4p_videomae.py:17-122) as a pure function over a param pytree:

* tubelet patchify is a reshape+matmul (identical math to the reference's
  Conv3d with kernel==stride, modeling_finetune.py:269-283) — one big
  (tokens x 1176 x embed) MXU matmul instead of a conv;
* the `depth` transformer blocks are stacked along a leading axis and run
  with `lax.scan` segment-by-segment between DPT hook indices, so only the
  hook features (reference: 41-entry features_list, l4p_videomae.py:108-115)
  are materialized, not all intermediate activations;
* attention is fused-QKV with the reference's split q/v-bias trick
  (zero k bias, modeling_finetune.py:171-178) and fp32 softmax.

Giant config (reference l4p_videomae.py:163-186): patch 14, dim 1408,
depth 40, heads 16, mlp 6144, tubelet 2, 16 frames, 224x224 -> 2048 tokens.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from l4p_tpu.ops.conv import layer_norm, gelu
from l4p_tpu.ops.attention import mha


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    img_size: int = 224
    patch_size: int = 14
    in_chans: int = 3
    embed_dim: int = 1408
    depth: int = 40
    num_heads: int = 16
    mlp_ratio: float = 48 / 11
    tubelet_size: int = 2
    all_frames: int = 16
    ln_eps: float = 1e-6
    cos_attn: bool = False  # cosine attention variant (modeling_finetune.py:72-134)
    use_learnable_pos_emb: bool = False  # (modeling_pretrain.py:73-77)
    # LayerScale: gamma_1/gamma_2 residual-branch gains of `init_values`
    # (reference modeling_finetune.py:239-243; the `init_values > 0` check
    # means the released 0.0 config has NO gammas — matching that exactly)
    init_values: float = 0.0
    # stochastic depth: per-block drop rates linearly spaced 0..rate
    # (reference modeling_pretrain.py:87-89); active only when a
    # `drop_path_key` is passed to encoder_apply (training)
    drop_path_rate: float = 0.0
    # Pallas flash-attention kernel on TPU (XLA mha elsewhere, e.g. the CPU
    # test mesh). Verified on a real v5e chip (scripts/verify_flash_tpu.py):
    # bf16 max |err| 1.8e-3 vs an fp32 highest-precision reference, 1.3x the
    # XLA attention at kernel level, 60.5 -> 54.4 ms for a full giant
    # encoder window.
    use_flash_attention: bool = True
    # optional Plucker camera embedding (reference l4p/models/blocks.py:13-53)
    cam_emb_placed_at: Optional[str] = None  # None | 'input' | 'output'
    cam_emb_type: str = "add"  # 'add' | 'concat'
    # rematerialize block activations in the backward pass (the TPU-native
    # equivalent of the reference's with_cp torch.utils.checkpoint flag,
    # modeling_pretrain.py:137-141)
    remat_blocks: bool = False
    # perf experiment knobs (scripts/exp_encoder_variants.py measures both on
    # the chip; flip the defaults only with on-chip numbers):
    # * unroll_blocks: Python-unrolled blocks instead of the stacked lax.scan
    #   — removes the per-step param dynamic-slice copies (~50 MB/block)
    #   at the cost of a depth-times-larger graph;
    # * matmul_out_compute_dtype: block einsums emit the compute dtype
    #   directly instead of fp32 (MXU accumulation stays fp32 either way;
    #   bias adds happen in the compute dtype) — removes the fp32
    #   materialization+cast between each matmul and its consumer. Exact in
    #   fp32; under bf16 it changes low-order bits (golden regen needed when
    #   flipped on).
    unroll_blocks: bool = False
    matmul_out_compute_dtype: bool = False
    # run the mesh-path flash kernel in Pallas interpret mode — CPU-mesh
    # equality tests only (tests/test_flash_sharded.py); never set on TPU
    flash_interpret: bool = False
    # whole-encoder Pallas megakernel (ops/fused_encoder.py): all blocks in
    # one kernel with VMEM-resident activations and streamed weights.
    # Inference-only (training falls back to the scan; the kernel's VJP
    # recomputes through the XLA blocks anyway), single-TPU bf16 only.
    fused_encoder: bool = False

    @property
    def tokens_thw(self):
        return (
            self.all_frames // self.tubelet_size,
            self.img_size // self.patch_size,
            self.img_size // self.patch_size,
        )

    @property
    def num_tokens(self) -> int:
        t, h, w = self.tokens_thw
        return t * h * w

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


GIANT = EncoderConfig()


def sinusoid_pos_embed(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sin/cos table, float64 math then float32 — matches the reference
    table construction (modeling_finetune.py:288-299)."""
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    dim = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None].astype(np.float32)  # (1, N, C)


def init_encoder_params(cfg: EncoderConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    """Xavier-uniform init mirroring the reference distributions
    (modeling_pretrain.py:106-113). Weight layouts are torch-convention
    (out, in) so checkpoint conversion is a reshape-free copy."""
    e, h, d = cfg.embed_dim, cfg.mlp_hidden, cfg.depth
    patch_in = cfg.in_chans * cfg.tubelet_size * cfg.patch_size * cfg.patch_size
    ks = jax.random.split(key, 8)

    def xavier(k, shape):
        fan_out, fan_in = shape[-2], shape[-1]
        a = float(np.sqrt(6.0 / (fan_in + fan_out)))
        return jax.random.uniform(k, shape, dtype, -a, a)

    params = {
        "patch_embed": {
            "weight": xavier(ks[0], (e, patch_in)),  # (E, Cin*kt*kh*kw) flattened
            "bias": jnp.zeros((e,), dtype),
        },
        "pos_embed": jnp.asarray(sinusoid_pos_embed(cfg.num_tokens, e), dtype),
        "blocks": {
            "norm1_w": jnp.ones((d, e), dtype),
            "norm1_b": jnp.zeros((d, e), dtype),
            "qkv_w": xavier(ks[1], (d, 3, e, e)),
            "q_bias": jnp.zeros((d, e), dtype),
            "v_bias": jnp.zeros((d, e), dtype),
            "proj_w": xavier(ks[2], (d, e, e)),
            "proj_b": jnp.zeros((d, e), dtype),
            "norm2_w": jnp.ones((d, e), dtype),
            "norm2_b": jnp.zeros((d, e), dtype),
            "fc1_w": xavier(ks[3], (d, h, e)),
            "fc1_b": jnp.zeros((d, h), dtype),
            "fc2_w": xavier(ks[4], (d, e, h)),
            "fc2_b": jnp.zeros((d, e), dtype),
        },
        "norm": {"weight": jnp.ones((e,), dtype), "bias": jnp.zeros((e,), dtype)},
    }
    if cfg.cos_attn:
        params["blocks"]["attn_scale"] = jnp.log(10.0) * jnp.ones((d, cfg.num_heads, 1, 1), dtype)
    if cfg.init_values > 0:
        params["blocks"]["gamma_1"] = cfg.init_values * jnp.ones((d, e), dtype)
        params["blocks"]["gamma_2"] = cfg.init_values * jnp.ones((d, e), dtype)
    if cfg.cam_emb_placed_at is not None:
        in_dim = 6 + (e if cfg.cam_emb_type == "concat" else 0)
        a = float(np.sqrt(1.0 / in_dim))
        params["cam_emb"] = {
            "weight": jax.random.uniform(ks[5], (e, in_dim), dtype, -a, a),
            "bias": jnp.zeros((e,), dtype),
        }
    return params


def patchify(x_b3thw: jnp.ndarray, w_flat: jnp.ndarray, b: jnp.ndarray, cfg: EncoderConfig) -> jnp.ndarray:
    """Tubelet patch embedding as reshape + matmul.

    Equivalent to Conv3d(kernel=stride=(tubelet, p, p)) flattened over
    (T', H', W') (reference modeling_finetune.py:276-283): token feature
    vector ordering is (c, dt, dh, dw).

    The ENCODER'S COMPUTE DTYPE IS ITS PARAM DTYPE: a float video is cast
    to the patch-embed weight dtype here, exactly like the uint8-ingest
    path (models/ingest.py compute_dtype). Before this cast, an fp32 video
    with bf16 params silently promoted the whole model to fp32 compute
    (2x HBM traffic end-to-end; caught when the fp32 lane of the
    fused_keys kernel blew scoped VMEM on the eval protocol).
    """
    x_b3thw = x_b3thw.astype(w_flat.dtype)
    B, C, T, H, W = x_b3thw.shape
    p, tt = cfg.patch_size, cfg.tubelet_size
    t2, h2, w2 = T // tt, H // p, W // p
    x = x_b3thw.reshape(B, C, t2, tt, h2, p, w2, p)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # (B, t', h', w', c, dt, dh, dw)
    x = x.reshape(B, t2 * h2 * w2, C * tt * p * p)
    out = jnp.einsum("bnk,ek->bne", x, w_flat.astype(x.dtype), preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _attention(q, k, v, scale: float, cfg: EncoderConfig, mesh=None):
    if not cfg.use_flash_attention:
        return mha(q, k, v, scale)
    if mesh is not None:
        # explicit shard_map wrapping: each device runs the kernel on its
        # local (B/nd, H/nm, N, D) shard — see ops/flash_attention.py
        from l4p_tpu.ops.flash_attention import (
            _on_tpu, flash_attention_sharded, flash_sharded_available)

        interp = cfg.flash_interpret
        if (interp or _on_tpu()) and flash_sharded_available(mesh, q.shape, k.shape[-2]):
            return flash_attention_sharded(q, k, v, scale, mesh, interp)
        return mha(q, k, v, scale)
    from l4p_tpu.ops.flash_attention import attention_auto

    return attention_auto(q, k, v, scale)


def _drop_path(x: jnp.ndarray, rate: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Stochastic depth on a residual branch: per-sample Bernoulli keep with
    1/keep rescale (reference timm drop_path semantics, stubbed identically in
    tests/oracle.py:26-33). `rate` may be a traced scalar (scan slice)."""
    keep = (1.0 - rate).astype(jnp.float32)
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * (mask.astype(jnp.float32) / keep).astype(x.dtype)


def _block(x: jnp.ndarray, p: Dict, cfg: EncoderConfig, dp=None, mesh=None) -> jnp.ndarray:
    """One pre-LN transformer block (reference modeling_finetune.py:245-252):
    x + drop_path(gamma_1 * attn(ln(x))), x + drop_path(gamma_2 * mlp(ln(x))).
    gamma_1/gamma_2 exist only when init_values > 0 (:239-243 — the released
    0.0 config has none); `dp=(rate, key)` enables stochastic depth (training
    only). With cfg.cos_attn, uses cosine-similarity attention with a
    learnable clamped log scale (modeling_finetune.py:109-134)."""
    B, N, E = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    # einsum output dtype: fp32 (then cast after the bias add) by default;
    # the compute dtype directly with matmul_out_compute_dtype (MXU still
    # accumulates fp32 internally — this only changes what HBM sees)
    pet = None if cfg.matmul_out_compute_dtype else jnp.float32
    bdt = x.dtype if cfg.matmul_out_compute_dtype else jnp.float32

    h = layer_norm(x, p["norm1_w"], p["norm1_b"], cfg.ln_eps)
    # qkv_w is (3, E, E): the output feature dim stays head-aligned so tensor
    # parallelism can shard it over heads (a fused (3E, E) layout would make
    # the 'model' split cross the q/k boundary and force all-gathers)
    qkv_bias = jnp.stack([p["q_bias"], jnp.zeros_like(p["v_bias"]), p["v_bias"]])  # (3, E)
    qkv = jnp.einsum("bne,sfe->bsnf", h, p["qkv_w"].astype(h.dtype), preferred_element_type=pet)
    qkv = (qkv + qkv_bias[None, :, None, :].astype(bdt)).astype(x.dtype)
    qkv = qkv.reshape(B, 3, N, nh, hd).transpose(1, 0, 3, 2, 4)  # (3, B, H, N, D)
    if cfg.cos_attn:
        qn = qkv[0] / jnp.linalg.norm(qkv[0].astype(jnp.float32), axis=-1, keepdims=True).astype(x.dtype)
        kn = qkv[1] / jnp.linalg.norm(qkv[1].astype(jnp.float32), axis=-1, keepdims=True).astype(x.dtype)
        # logit scale clamped at log(1/0.01) (modeling_finetune.py:122-125)
        logit_scale = jnp.exp(jnp.minimum(p["attn_scale"].astype(jnp.float32), 4.6052))  # (H,1,1)
        attn_out = mha(qn * logit_scale[None].astype(x.dtype), kn, qkv[2], scale=1.0)
    else:
        attn_out = _attention(qkv[0], qkv[1], qkv[2], hd ** -0.5, cfg, mesh)
    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, N, E)
    proj = jnp.einsum("bne,fe->bnf", attn_out, p["proj_w"].astype(x.dtype), preferred_element_type=pet)
    branch = (proj + p["proj_b"].astype(bdt)).astype(x.dtype)
    if "gamma_1" in p:
        branch = branch * p["gamma_1"].astype(x.dtype)
    if dp is not None:
        branch = _drop_path(branch, dp[0], jax.random.fold_in(dp[1], 0))
    x = x + branch

    h = layer_norm(x, p["norm2_w"], p["norm2_b"], cfg.ln_eps)
    h1 = jnp.einsum("bne,fe->bnf", h, p["fc1_w"].astype(h.dtype), preferred_element_type=pet)
    h1 = gelu((h1 + p["fc1_b"].astype(bdt)).astype(x.dtype))
    h2 = jnp.einsum("bnf,ef->bne", h1, p["fc2_w"].astype(h1.dtype), preferred_element_type=pet)
    branch = (h2 + p["fc2_b"].astype(bdt)).astype(x.dtype)
    if "gamma_2" in p:
        branch = branch * p["gamma_2"].astype(x.dtype)
    if dp is not None:
        branch = _drop_path(branch, dp[0], jax.random.fold_in(dp[1], 1))
    x = x + branch
    return x


def _slice_blocks(blocks: Dict, lo: int, hi: int) -> Dict:
    return {k: v[lo:hi] for k, v in blocks.items()}


def fused_encoder_engaged(cfg: EncoderConfig, params: Dict, n_tokens: int,
                          dtype, mesh=None) -> bool:
    """Runtime gate for the whole-encoder megakernel: supported shapes
    (ops/fused_encoder.fused_encoder_available) on a single TPU in bf16
    (the production inference path), or anywhere under
    cfg.flash_interpret (CPU equality tests)."""
    if mesh is not None or cfg.cos_attn:
        return False
    from l4p_tpu.ops.fused_encoder import fused_encoder_available

    if not fused_encoder_available(cfg, params, n_tokens):
        return False
    if cfg.flash_interpret:
        return True
    from l4p_tpu.ops.flash_attention import _on_tpu, _single_device

    return bool(_on_tpu() and _single_device() and dtype == jnp.bfloat16)


def plucker_camera_embedding(
    params: Dict,
    feat_blc: jnp.ndarray,
    emb_thw: Tuple[int, int, int],
    intrinsics_b44t: jnp.ndarray,
    extrinsics_b44t: jnp.ndarray,
    embed_type: str = "add",
) -> jnp.ndarray:
    """Project 6-ch Plucker ray maps into the token stream (reference
    l4p/models/blocks.py:26-53): rays at the patch grid, temporally
    interpolated to tubelet steps, linearly projected, added to tokens."""
    from l4p_tpu.geometry.core import get_rays_plucker
    from l4p_tpu.ops.conv import linear
    from l4p_tpu.ops.resize import resize_linear

    b = intrinsics_b44t.shape[0]
    et, eh, ew = emb_thw
    camray, _ = get_rays_plucker(intrinsics_b44t, extrinsics_b44t, (eh, ew), normalize_dist=False)
    # (B,6,T,h,w) -> temporal linear interp to et steps (blocks.py:36-43)
    t_full = camray.shape[2]
    flat = camray.transpose(0, 3, 4, 1, 2).reshape(b, -1, t_full)
    flat = resize_linear(flat, (et,), (2,), align_corners=False)
    plucker = flat.reshape(b, eh, ew, 6, et).transpose(0, 4, 1, 2, 3).reshape(b, -1, 6)
    plucker = plucker.astype(feat_blc.dtype)
    if embed_type == "concat":
        emb = linear(jnp.concatenate([feat_blc, plucker], -1), params["weight"], params["bias"])
    else:
        emb = linear(plucker, params["weight"], params["bias"])
    return feat_blc + emb


def encoder_apply(
    params: Dict,
    x_b3thw: Optional[jnp.ndarray],
    cfg: EncoderConfig = GIANT,
    hooks: Sequence[int] = (14, 21, 28, 36),
    want_final: bool = True,
    intrinsics_b44t: Optional[jnp.ndarray] = None,
    extrinsics_b44t: Optional[jnp.ndarray] = None,
    tokens_bne: Optional[jnp.ndarray] = None,
    drop_path_key: Optional[jax.Array] = None,
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    """Run the encoder, returning only what the heads consume.

    The reference materializes all 41 per-block features
    (l4p_videomae.py:108-115); the DPT heads read indices `hooks` of that
    list (index 0 = patch embedding, index i = output of block i-1,
    dpt_head.py:50) and the track head reads the final normed feature.
    Here blocks run as `lax.scan` segments between hook boundaries.

    `tokens_bne` bypasses patchify with pre-embedded (pos-embed-free) tokens
    — the fused uint8 ingest path (models/ingest.py), where the whole video
    is tokenized once and windows are sliced in token space.

    Returns {'hooks': [feat_bpc per hook], 'final': normed final feature}.
    """
    if tokens_bne is not None:
        x = tokens_bne
        emb_thw = cfg.tokens_thw
    else:
        x = patchify(x_b3thw, params["patch_embed"]["weight"], params["patch_embed"]["bias"], cfg)
        emb_thw = (
            x_b3thw.shape[2] // cfg.tubelet_size,
            x_b3thw.shape[3] // cfg.patch_size,
            x_b3thw.shape[4] // cfg.patch_size,
        )
    pos = params["pos_embed"].astype(x.dtype)
    x = x + (pos if cfg.use_learnable_pos_emb else jax.lax.stop_gradient(pos))
    if cfg.cam_emb_placed_at == "input":
        x = plucker_camera_embedding(
            params["cam_emb"], x, emb_thw, intrinsics_b44t, extrinsics_b44t, cfg.cam_emb_type
        )

    hooks = list(hooks)
    boundaries = sorted(set([h for h in hooks if h > 0] + [cfg.depth]))

    feats: Dict[int, jnp.ndarray] = {}
    if 0 in hooks:
        feats[0] = x

    dp_active = drop_path_key is not None and cfg.drop_path_rate > 0
    if (
        cfg.fused_encoder
        and not dp_active
        and fused_encoder_engaged(cfg, params, x.shape[1], x.dtype, mesh)
    ):
        from l4p_tpu.ops.fused_encoder import fused_encoder_blocks

        ends = tuple(boundaries)
        stack = fused_encoder_blocks(params, x, cfg, ends)
        for i, e_ in enumerate(ends):
            feats[e_] = stack[:, i]
        x = feats[cfg.depth]
        boundaries = []  # scan path skipped entirely

    raw_block = lambda x_, p_, dp_=None: _block(x_, p_, cfg, dp_, mesh)
    block_fn = jax.checkpoint(raw_block) if cfg.remat_blocks else raw_block

    # stochastic depth (training only): per-block rates linearly spaced
    # 0..drop_path_rate (reference modeling_pretrain.py:87-89), one PRNG key
    # per block, threaded through the scan as extra xs
    if dp_active:
        dp_rates = jnp.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        dp_keys = jax.random.split(drop_path_key, cfg.depth)

    def scan_segment(x, lo, hi):
        blocks_slice = _slice_blocks(params["blocks"], lo, hi)
        if cfg.unroll_blocks:
            for i in range(hi - lo):
                bp = {k: v[i] for k, v in blocks_slice.items()}
                dp_i = (dp_rates[lo + i], dp_keys[lo + i]) if dp_active else None
                x = block_fn(x, bp, dp_i) if dp_active else block_fn(x, bp)
            return x
        if dp_active:
            def body(carry, xs):
                p, r, k = xs
                return block_fn(carry, p, (r, k)), None

            out, _ = lax.scan(body, x, (blocks_slice, dp_rates[lo:hi], dp_keys[lo:hi]))
        else:
            def body(carry, p):
                return block_fn(carry, p), None

            out, _ = lax.scan(body, x, blocks_slice)
        return out

    prev = 0
    for b in boundaries:
        if b > prev:
            x = scan_segment(x, prev, b)
        if b in hooks:
            feats[b] = x
        prev = b

    # The reference overwrites features_list[depth] with head(norm(x)), head
    # being Identity for num_classes=0 (l4p_videomae.py:115,
    # modeling_pretrain.py:99) — so a hook at index==depth sees the normed
    # output, and `final` is that same tensor.
    final = layer_norm(x, params["norm"]["weight"], params["norm"]["bias"], cfg.ln_eps)
    if cfg.depth in hooks:
        feats[cfg.depth] = final

    if cfg.cam_emb_placed_at == "output":
        # reference applies the embedding to every feature level
        # (l4p_videomae.py:117-120)
        emb = lambda f: plucker_camera_embedding(
            params["cam_emb"], f, emb_thw, intrinsics_b44t, extrinsics_b44t, cfg.cam_emb_type
        )
        feats = {k: emb(v) for k, v in feats.items()}
        final = emb(final)

    out = {"hooks": [feats[h] for h in hooks]}
    if want_final:
        out["final"] = final
    return out
