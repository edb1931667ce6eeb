"""Promptable 2D/3D point-tracking head (SAM-style) — single-window forward
and the causal sliding-window scan.

Re-designs the reference VideoMAETrack2DSamHead (reference:
l4p/models/task_heads/sparse_heads.py:19-667):
  * queries are a batch dimension end-to-end (no per-batch Python loop,
    sparse_heads.py:542-555);
  * the per-point re-query loop (sparse_heads.py:464-479) is one
    argmax + gather;
  * the sliding-window carry (re-queries, prompt features, masked token
    memory) becomes a `lax.scan` over windows with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from l4p_tpu.models.sam import (
    SamConfig,
    dense_pe,
    mask_decoder_apply,
    prompt_encoder_apply,
)
import numpy as np

from l4p_tpu.ops.conv import linear
from l4p_tpu.ops.misc import apply_fn, largest_divisor_leq
from l4p_tpu.ops.resize import _interp_matrix, interpolate_trilinear


def _interp_full(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align_corners=False interpolation matrix."""
    return _interp_matrix(n_in, n_out, align_corners=False)


def _interp_colmean(n_in: int, n_out: int) -> np.ndarray:
    """Column means of the interpolation matrix: mean over the upsampled axis
    == this weighted mean over the low-res axis (exact)."""
    return _interp_matrix(n_in, n_out, align_corners=False).mean(axis=0)


@dataclasses.dataclass(frozen=True)
class TrackConfig:
    task_name: str = "track_2d"
    image_size: Tuple[int, int, int] = (16, 224, 224)
    patch_size: Tuple[int, int, int] = (2, 14, 14)
    estimate_vis: bool = True
    estimate_depth: bool = True
    modify_pointlabels_for_windowing: bool = True
    prompt_using_features: bool = True
    attend_to_past: bool = True
    depth_fn: str = "exp"
    vis_fn: str = "linear"
    max_queries: int = 128
    num_prompt_points: int = 2
    # (1,) forward-only (released config); (-1,) backward via video flip;
    # (1, -1) bidirectional merge (sparse_heads.py:242-245 prescribes the
    # flip scheme)
    estimation_directions: Tuple[int, ...] = (1,)
    sam: SamConfig = dataclasses.field(default_factory=SamConfig)

    @property
    def token_ids(self) -> Dict[str, int]:
        ids = {"xy": 0}
        n = 1
        if self.estimate_vis:
            ids["vis"] = n
            n += 1
        if self.estimate_depth:
            ids["depth"] = n
            n += 1
        if self.prompt_using_features:
            ids["prompt_feat"] = n + self.num_prompt_points
        return ids

    @property
    def num_mask_tokens(self) -> int:
        return 1 + int(self.estimate_vis) + int(self.estimate_depth)


def init_track_params(cfg: TrackConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    """Random init of the full tracking head (prompt encoder + two-way
    transformer + mask decoder), matching torch module defaults in shape."""
    sam = cfg.sam
    c = sam.embed_dim
    keys = iter(jax.random.split(key, 256))

    def lin(din, dout):
        # np (not jnp): a static init bound — keeps init eval_shape-traceable
        a = float(1.0 / np.sqrt(din))
        return {
            "weight": jax.random.uniform(next(keys), (dout, din), dtype, -a, a),
            "bias": jax.random.uniform(next(keys), (dout,), dtype, -a, a),
        }

    def norm(d):
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def attn(downsample=1):
        d_in = c
        d_int = c // downsample
        return {
            "q_proj": lin(d_in, d_int),
            "k_proj": lin(d_in, d_int),
            "v_proj": lin(d_in, d_int),
            "out_proj": lin(d_int, d_in),
        }

    dr = sam.attention_downsample_rate
    layers = [
        {
            "self_attn": attn(1),
            "norm1": norm(c),
            "cross_attn_token_to_image": attn(dr),
            "norm2": norm(c),
            "mlp": {"lin1": lin(c, sam.mlp_dim), "lin2": lin(sam.mlp_dim, c)},
            "norm3": norm(c),
            "norm4": norm(c),
            "cross_attn_image_to_token": attn(dr),
        }
        for _ in range(sam.sam_head_depth)
    ]
    d1, d2 = sam.decode_dims

    def deconv(cin, cout, k):
        import numpy as _np

        fan = cin * int(_np.prod(k))
        a = float(1.0 / np.sqrt(fan))
        return {
            "weight": jax.random.uniform(next(keys), (cin, cout, *k), dtype, -a, a),
            "bias": jax.random.uniform(next(keys), (cout,), dtype, -a, a),
        }

    params = {
        "prompt_encoder": {
            "pe_gaussian": jax.random.normal(next(keys), (3, c // 2), dtype),
            "point_embeddings": jax.random.normal(next(keys), (sam.num_point_embeddings, c), dtype),
            "not_a_point_embed": jax.random.normal(next(keys), (c,), dtype),
            "prompt_feature_embeddings": jax.random.normal(next(keys), (2, c), dtype),
        },
        "mask_decoder": {
            "mask_tokens": jax.random.normal(next(keys), (cfg.num_mask_tokens, c), dtype),
            "transformer": {
                "layers": layers,
                "final_attn_token_to_image": attn(dr),
                "norm_final_attn": norm(c),
            },
            "upscale": {
                "deconv1": deconv(c, d1, (2, 2, 2)),
                "ln": norm(d1),
                "deconv2": deconv(d1, d2, (1, 2, 2)),
            },
            "hypernet": [
                {"layers": [lin(c, c), lin(c, c), lin(c, d2)]} for _ in range(cfg.num_mask_tokens)
            ],
        },
    }
    if cfg.prompt_using_features:
        params["prompt_feature_linear"] = lin(c, c)
    if cfg.attend_to_past:
        params["processed_video_mask_token"] = jax.random.normal(next(keys), (c,), dtype)
        params["processed_video_features_proj"] = lin(c, c)
    return params


def softargmax_xy(logits_nthw: jnp.ndarray, image_hw: Tuple[int, int]) -> jnp.ndarray:
    """Soft-argmax over HxW with pixel-center grid
    (sparse_heads.py:140-155). logits: (N, T, H, W) -> (N, T, 2) as (x, y).

    Computed as (sum e*x, sum e*y) / sum e rather than normalizing a
    softmax heatmap first: identical math (the 1/sum factors out of the
    linear expectation), but the (N, T, H*W) normalized heatmap — the
    full forward's PEAK tensor at full resolution — is never materialized;
    the three reductions share the exp producer in one fused pass."""
    n, t, h, w = logits_nthw.shape
    lf = logits_nthw.reshape(n, t, h * w).astype(jnp.float32)
    m = jnp.max(lf, axis=-1, keepdims=True)
    z = jnp.exp(lf - m)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)
    grid_x = jnp.broadcast_to(xs[None, :], (h, w)).reshape(-1)
    grid_y = jnp.broadcast_to(ys[:, None], (h, w)).reshape(-1)
    s = z.sum(-1)
    x_est = (z * grid_x).sum(-1) / s
    y_est = (z * grid_y).sum(-1) / s
    return jnp.stack([x_est, y_est], axis=-1)


def track_forward_item(
    params: Dict,
    cfg: TrackConfig,
    enc_features: jnp.ndarray,  # (P, C) shared or (N, P, C) per-query tokens
    queries_n3: jnp.ndarray,
    labels_n: jnp.ndarray,
    prompt_features_nc: Optional[jnp.ndarray] = None,
    prompt_feature_labels_n: Optional[jnp.ndarray] = None,
    mesh=None,
    kernels_interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Single-window, single-batch-item forward (reference
    sparse_heads.py:497-667 with N as the decoder batch)."""
    sam = cfg.sam
    n = queries_n3.shape[0]

    sparse = prompt_encoder_apply(
        params["prompt_encoder"],
        sam,
        queries_n3[:, None, :],
        labels_n[:, None],
        prompt_features_nc[:, None, :] if prompt_features_nc is not None else None,
        prompt_feature_labels_n[:, None] if prompt_feature_labels_n is not None else None,
    )

    img = enc_features if enc_features.ndim == 3 else enc_features[None]
    pe = dense_pe(params["prompt_encoder"], sam)
    # prompts are computed in the query dtype (fp32 coords); the decoder runs
    # in the encoder's compute dtype
    sparse = sparse.astype(img.dtype)
    logits, processed = mask_decoder_apply(
        params["mask_decoder"], sam, img, pe, sparse,
        mesh=mesh, kernels_interpret=kernels_interpret,
    )

    tid = cfg.token_ids
    out: Dict[str, jnp.ndarray] = {}
    # xy needs the full-resolution heatmap: upsample only the xy channel
    # (N, 2t, 4h, 4w) -> (N, T, H, W), align_corners=False
    # (sparse_heads.py:645-647)
    # lerp method: elementwise resize fuses into the softargmax's softmax
    # loop (~3x faster on TPU than the matmul resize, which can't fuse).
    # Chunked over queries: the full-res heatmap is the PEAK allocation of
    # the whole forward (at N=128/window, (N,16,224,224) fp32 + softmax
    # temps ≈ 9.7 GB of the track stage's memory analysis); per-query
    # results are independent, so a lax.map over query chunks is bitwise
    # identical at ~1/4 the working set. Chunk snapped to a divisor of N
    # (a remainder would compile the body twice).
    def _xy_chunk(lg):  # one query's (t2, h2, w2); lax.map vmaps chunks of it
        xl = interpolate_trilinear(lg[None], cfg.image_size, align_corners=False, method="lerp")
        return softargmax_xy(xl, cfg.image_size[1:])[0]

    xy_chunk = largest_divisor_leq(n, 32)
    out["traj_nt2"] = jax.lax.map(
        _xy_chunk, logits[:, tid["xy"]], batch_size=xy_chunk
    )  # (N, T, 2)

    # vis/depth only need the spatial MEAN of the upsampled logits — a mean
    # over a linear resize is exactly a weighted mean of the low-res map
    # (column sums of the interp matrices), so those channels never
    # materialize at full resolution (reference upsamples all channels then
    # averages, sparse_heads.py:157-160, :584-589)
    if cfg.estimate_vis or cfg.estimate_depth:
        low = logits  # (N, M, t2, h2, w2)
        t2, h2, w2 = low.shape[-3:]
        T, H, W = cfg.image_size
        wt = jnp.asarray(_interp_colmean(t2, T), low.dtype)
        wh = jnp.asarray(_interp_colmean(h2, H), low.dtype)
        ww = jnp.asarray(_interp_colmean(w2, W), low.dtype)
        # temporal axis keeps per-frame values (full interp matrix); H/W mean
        mt = jnp.asarray(_interp_full(t2, T), low.dtype)  # (T, t2)
        spatial_mean = jnp.einsum(
            "nmthw,h,w->nmt", low, wh, ww, precision=jax.lax.Precision.HIGHEST
        )
        per_frame = jnp.einsum("nmt,Tt->nmT", spatial_mean, mt, precision=jax.lax.Precision.HIGHEST)
        if cfg.estimate_vis:
            out["vis_nt"] = apply_fn(per_frame[:, tid["vis"]], cfg.vis_fn)
        if cfg.estimate_depth:
            out["depth_nt"] = apply_fn(per_frame[:, tid["depth"]], cfg.depth_fn)

    if cfg.prompt_using_features:
        pf = processed["io_features"][:, tid["prompt_feat"], :]
        out["prompt_features_nc"] = linear(
            pf, params["prompt_feature_linear"]["weight"], params["prompt_feature_linear"]["bias"]
        )
    if cfg.attend_to_past:
        # Only the LAST te/2 tubelet steps of the processed features survive
        # into the next window's memory (the time shift keeps the overlap and
        # fills the rest with the learned mask token, sparse_heads.py:428-434)
        # — slice BEFORE projecting: halves the projection matmul and the
        # carried memory; the mask-token half is a constant the windowed
        # scan re-attaches.
        te = cfg.sam.image_embedding_size[0]
        pn = processed["enc_features"].shape[-2]
        kept = processed["enc_features"].reshape(
            processed["enc_features"].shape[0], te, pn // te, -1
        )[:, te // 2 :].reshape(processed["enc_features"].shape[0], pn // 2, -1)
        # emit the compute dtype straight from the dot: this projection's
        # output is the scan's big carry ((N, P/2, C) per window); an
        # fp32-typed einsum makes XLA materialize + convert ~740 MB/window
        # at N=128 (MXU accumulation is fp32 either way — only the bias-add
        # rounding differs, in bf16 noise)
        wproj = params["processed_video_features_proj"]["weight"]
        hist = jnp.einsum("npi,oi->npo", kept, wproj.astype(kept.dtype))
        out["enc_history_kept_npc"] = hist + params[
            "processed_video_features_proj"
        ]["bias"].astype(hist.dtype)
    return out


def track_forward(
    params: Dict,
    cfg: TrackConfig,
    enc_features_bpc: jnp.ndarray,  # (B, P, C) or (B, N, P, C)
    queries_bn3: jnp.ndarray,
    labels_bn: jnp.ndarray,
    prompt_features_bnc: Optional[jnp.ndarray] = None,
    prompt_feature_labels_bn: Optional[jnp.ndarray] = None,
    mesh=None,
    kernels_interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Batched single-window forward; returns reference-shaped outputs
    ({task}_traj_est_bn2t etc., sparse_heads.py:566-591)."""
    fn = lambda e, q, l, pf, pfl: track_forward_item(
        params, cfg, e, q, l, pf, pfl, mesh=mesh, kernels_interpret=kernels_interpret
    )
    if mesh is not None:
        # shard_map-wrapped kernels inside: keep the batch axis as a python
        # loop (B is 1 in every production path) instead of vmapping over a
        # shard_map
        items = [
            fn(
                enc_features_bpc[i], queries_bn3[i], labels_bn[i],
                None if prompt_features_bnc is None else prompt_features_bnc[i],
                None if prompt_feature_labels_bn is None else prompt_feature_labels_bn[i],
            )
            for i in range(enc_features_bpc.shape[0])
        ]
        item = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *items)
    else:
        in_axes = (0, 0, 0, 0 if prompt_features_bnc is not None else None,
                   0 if prompt_feature_labels_bn is not None else None)
        item = jax.vmap(fn, in_axes=in_axes)(
            enc_features_bpc, queries_bn3, labels_bn, prompt_features_bnc, prompt_feature_labels_bn
        )
    t = cfg.task_name
    out = {f"{t}_traj_est_bn2t": item["traj_nt2"].transpose(0, 1, 3, 2)}
    if cfg.estimate_vis:
        out[f"{t}_vis_est_bn1t"] = item["vis_nt"][:, :, None, :]
    if cfg.estimate_depth:
        out[f"{t}_depth_est_bn1t"] = item["depth_nt"][:, :, None, :]
    if cfg.prompt_using_features:
        out[f"{t}_prompt_features_bnc"] = item["prompt_features_nc"]
    if cfg.attend_to_past:
        out[f"{t}_enc_history_kept_bnpc"] = item["enc_history_kept_npc"]
    return out


def track_forward_windowed(
    params: Dict,
    cfg: TrackConfig,
    enc_final_wbpc: jnp.ndarray,  # (num_windows, B, P, C) final encoder feats
    queries_bn3: jnp.ndarray,
    labels_bn: jnp.ndarray,
    window_stride: int = 8,
    mesh=None,
    kernels_interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Causal sliding-window tracking as a `lax.scan` over windows
    (reference forward_windowed_core, sparse_heads.py:213-495; forward
    direction only, B==1, matching the released config's
    estimation_directions=[1]).

    Carries: current re-queries, prompt features + labels, masked token
    memory, and the T-length output buffers. The reference's per-point
    re-query Python loop (sparse_heads.py:464-479) is an argmax + gather.
    """
    sam = cfg.sam
    nw, b, p, c = enc_final_wbpc.shape
    n = queries_bn3.shape[1]
    ws = cfg.image_size[0]
    t_total = (nw - 1) * window_stride + ws
    te, he, we_ = sam.image_embedding_size
    dtype = queries_bn3.dtype  # buffers/queries (fp32 coordinates)
    mdtype = enc_final_wbpc.dtype  # model compute dtype (e.g. bf16 on TPU)

    if cfg.attend_to_past:
        # the carry holds only the KEPT half of the token memory — the other
        # half is always the learned mask token, re-attached below as a
        # query-broadcast constant (halves the scan's big-carry copies)
        hist0 = jnp.broadcast_to(
            params["processed_video_mask_token"].astype(mdtype)[None, None, None, :],
            (b, n, p // 2, c),
        )
    else:
        # scalar placeholder — carrying a real (B,N,P,C) zeros buffer would
        # waste HBM/copy bandwidth every scan step for a value never read
        hist0 = jnp.zeros((1,), mdtype)

    carry0 = {
        "queries": queries_bn3,
        "prompt_feats": jnp.zeros((b, n, c), mdtype),
        "prompt_labels": jnp.zeros((b, n), dtype),
        "history": hist0,
        "traj": jnp.zeros((b, n, 2, t_total), dtype),
        "vis": -10.0 * jnp.ones((b, n, 1, t_total), dtype),
        "depth": jnp.zeros((b, n, 1, t_total), dtype),
    }

    frame_ids = jnp.arange(ws, dtype=dtype)

    def step(carry, inputs):
        w_idx, enc_bpc = inputs
        start = (w_idx * window_stride).astype(dtype)
        cur_q = carry["queries"]

        # validity: results exist at t >= query time (sparse_heads.py:303-319)
        valid_t = (frame_ids[None, None, :] + start + 0.5 - cur_q[:, :, 0:1]) >= 0  # (B,N,ws)
        valid_bn1t = valid_t[:, :, None, :]
        valid_bn = valid_t.sum(-1) > 0

        # labels 0/1/2 (sparse_heads.py:322-335). The reference's overwrite
        # ORDER matters: the equals-input pass sets label 1 even for queries
        # not yet valid in this window (their window arrives later), so an
        # input query is never labeled 0 — only padding queries are.
        lab = jnp.where(valid_bn, 1.0, 0.0).astype(dtype)
        if cfg.modify_pointlabels_for_windowing:
            eq_input = ((cur_q == queries_bn3).sum(-1)) > 0
            lab = jnp.where(eq_input, 1.0, lab)
            lab = jnp.where(jnp.logical_and(valid_bn, ~eq_input), 2.0, lab)

        q_off = cur_q.at[:, :, 0].add(-start)

        if cfg.attend_to_past:
            # first half of the window's tokens: per-query kept memory;
            # second half: the constant mask token, shared by all queries
            first = enc_bpc[:, None, : p // 2] + carry["history"]  # (B,N,P/2,C)
            second = (enc_bpc[:, p // 2 :] + params["processed_video_mask_token"].astype(mdtype))[
                :, None
            ]
            enc_in = jnp.concatenate(
                [first, jnp.broadcast_to(second, (b, n, p - p // 2, c))], axis=2
            )
        else:
            enc_in = enc_bpc

        out = track_forward(
            params, cfg, enc_in, q_off, lab, carry["prompt_feats"], carry["prompt_labels"],
            mesh=mesh, kernels_interpret=kernels_interpret,
        )
        tname = cfg.task_name
        start_i = (w_idx * window_stride).astype(jnp.int32)

        def masked_write(buf, vals):
            old = jax.lax.dynamic_slice_in_dim(buf, start_i, ws, axis=-1)
            new = jnp.where(valid_bn1t, vals.astype(buf.dtype), old)
            return jax.lax.dynamic_update_slice_in_dim(buf, new, start_i, axis=-1)

        vis_buf = masked_write(carry["vis"], out[f"{tname}_vis_est_bn1t"])
        traj_buf = masked_write(carry["traj"], out[f"{tname}_traj_est_bn2t"])
        depth_buf = carry["depth"]
        if cfg.estimate_depth:
            depth_buf = masked_write(carry["depth"], out[f"{tname}_depth_est_bn1t"])

        # ---- prepare next window (the reference skips this after the last
        # window, sparse_heads.py:381-486 — equivalent here: the scan's final
        # carry is discarded except for the output buffers, so computing the
        # unused update costs nothing and avoids three full-size selects) ----
        new_pf = carry["prompt_feats"]
        new_pl = carry["prompt_labels"]
        if cfg.prompt_using_features:
            new_pf = jnp.where(valid_bn[..., None], out[f"{tname}_prompt_features_bnc"].astype(mdtype), new_pf)
            new_pl = jnp.where(valid_bn, 1.0, new_pl).astype(dtype)

        new_hist = carry["history"]
        if cfg.attend_to_past:
            # already sliced to the kept overlap steps and projected inside
            # track_forward (sparse_heads.py:428-434 semantics)
            new_hist = out[f"{tname}_enc_history_kept_bnpc"].astype(mdtype)

        # re-query at the argmax-visibility frame inside the next overlap
        # (sparse_heads.py:450-486)
        next_start = start_i + window_stride
        overlap_len = ws - window_stride
        vis_ov = jax.lax.dynamic_slice_in_dim(vis_buf, next_start, overlap_len, axis=-1)
        traj_ov = jax.lax.dynamic_slice_in_dim(traj_buf, next_start, overlap_len, axis=-1)
        best = jnp.argmax(vis_ov[:, :, 0, :], axis=-1)  # (B,N)
        best_xy = jnp.take_along_axis(traj_ov, best[:, :, None, None], axis=-1)[..., 0]  # (B,N,2)
        new_t = best.astype(dtype) + next_start.astype(dtype) + 0.5
        cand_q = jnp.concatenate([new_t[..., None], best_xy], axis=-1)
        q_valid = cand_q[..., 0] > cur_q[..., 0]
        new_q = jnp.where(q_valid[..., None], cand_q, cur_q)

        next_carry = {
            "queries": new_q,
            "prompt_feats": new_pf,
            "prompt_labels": new_pl,
            "history": new_hist,
            "traj": traj_buf,
            "vis": vis_buf,
            "depth": depth_buf,
        }
        return next_carry, None

    w_ids = jnp.arange(nw)
    final, _ = jax.lax.scan(step, carry0, (w_ids, enc_final_wbpc))

    t = cfg.task_name
    out = {
        f"{t}_traj_est_bn2t": final["traj"],
        f"{t}_vis_est_bn1t": final["vis"],
    }
    if cfg.estimate_depth:
        out[f"{t}_depth_est_bn1t"] = final["depth"]
    return out
