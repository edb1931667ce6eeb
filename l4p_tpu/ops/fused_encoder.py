"""Whole-encoder Pallas megakernel: all transformer blocks in ONE kernel.

STATUS (round 5, measured on TPU v5e): CORRECT BUT SLOWER THAN THE XLA
PATH — kept behind the default-off `EncoderConfig.fused_encoder` flag as a
fully-working, parity-tested negative result. Best tuned composition (fori
tile loops + per-head output-projection accumulation + packed qkv scratch
+ MXU-natural pre-transposed weights) runs 52.4-66 ms/window vs 37.6 for
the production XLA+flash path on identical giant shapes. Per-phase grids
measured qkv/attention/MLP at 48%/75%/62% of padded roofline with an
additional structural composition penalty when all phases share one
program (54 ms phase-sum -> 66-79 ms combined; compile time scales the
same way — likely instruction-fetch pressure from the multi-branch
program). Lane-concat across 16 heads and per-head scatter stores with
dynamic sublane offsets were each measured 1.3-1.6x penalties and are
avoided in the final form; TQ=1024 tiles regressed (fp32 intermediate
spills). Conclusion: at these shapes Mosaic's scheduling of fused
multi-phase programs loses more than VMEM-residency saves — don't retry
without a new mechanism. Full numbers: ROUND_NOTES.md round 5,
scripts/exp_fused_encoder.py.

The motivating round-4 attribution pinned the ViT-giant encoder at 53.7%
MFU while the dense heads run ~70% — the hypothesis was inter-op HBM
traffic: the XLA block (models/encoder.py:_block) round-trips every
intermediate (LN1 out, qkv, head transpose, attention out, proj, LN2 out,
fc1/gelu, fc2) through HBM, ~200+ MB per block at the giant window shape
(reference hot loop:
l4p/models/VideoMAEv2/models/modeling_finetune.py:180-252).

This kernel keeps the ACTIVATIONS RESIDENT IN VMEM for the entire depth-40
stack and streams only the weights from HBM (which both paths must do
anyway). v5e has 128 MiB VMEM (probed: 120 MB of Pallas scratch compiles
and runs — scripts/probe_vmem.py); the kernel uses ~95 MB at the giant
window shape (N=2048, E=1408).

Grid: (B, depth, P) — B = batch of independent windows, depth = blocks,
P = 3 + 1 + n_mlp_chunks phases per block:

  p=0,1,2   LN1 + q/k/v projection (one phase per q|k|v), written into a
            per-head VMEM scratch padded D=88 -> 128 lanes. The padding
            rows of the weights are zero, so padded lanes carry exact
            zeros end-to-end (scores and P@V are unaffected).
  p=3       attention (full softmax per q-tile — the whole window's K/V is
            in VMEM, no online-softmax rescaling needed), per-head outputs
            concatenated in registers, ONE deep output-projection matmul,
            residual, and LN2 for the MLP phases.
  p=4..     MLP in hc-column chunks of the hidden dim: LN2(x') @ fc1_c ->
            gelu -> @ fc2_c accumulated in an fp32 scratch; the last chunk
            adds the residual and writes hook features via manual DMA.

Weights are streamed per phase through Pallas's automatic double
buffering: each weight chunk is <= 5.8 MB and prefetches during the
previous ~100 us compute phase. x_in / hook outputs live in ANY (HBM) and
move via explicit async copies, so they cost no double-buffered VMEM.

Numerics match models/encoder.py:_block step for step: fp32 LN stats,
fp32 matmul accumulation, fp32 softmax, bias adds in fp32 then cast to the
compute dtype, residual adds in the compute dtype, and the same
dtype-dependent GELU as ops/conv.py (tanh-approx for bf16, exact erf
otherwise).

Differentiable: custom_vjp recomputes the backward through the XLA block
path (models/encoder.py), the same flash-style recompute pattern as
ops/flash_attention.py — nothing is saved from the kernel forward.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

DP = 128  # padded head dim (MXU lane width)
TQ = int(_os.environ.get("L4P_FE_TQ", "256"))  # token tile (env: perf experiments)
TQA = int(_os.environ.get("L4P_FE_TQA", "256"))  # attention q tile


def _mlp_chunk(hidden: int) -> int:
    """Largest chunk <= 2048 that divides the mlp hidden dim and is
    lane-aligned (giant: 6144 -> 2048)."""
    for hc in (2048, 1536, 1024, 768, 512, 384, 256, 128):
        if hidden % hc == 0:
            return hc
    return 0


def fused_encoder_available(cfg, params: Dict, n_tokens: int) -> bool:
    """Static gate: shapes/features the kernel supports. Caller additionally
    gates on device (TPU, single-chip) and dtype (bf16 VMEM budget)."""
    blocks = params["blocks"]
    e, nh, d = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    return (
        not cfg.cos_attn
        and "gamma_1" not in blocks
        and d <= DP
        and e % 128 == 0
        and n_tokens % TQ == 0
        and _mlp_chunk(cfg.mlp_hidden) > 0
        # VMEM budget: x + xln + qkv scratch + fp32 mlp acc must stay under
        # ~60 MB so weight double-buffers (+~47 MB at giant) fit in 120 MB
        and (2 * n_tokens * e * 2 + 3 * nh * n_tokens * DP * 2 + n_tokens * e * 4)
        < 64 * 1024 * 1024
    )


def prepare_fused_params(params: Dict, cfg) -> Dict:
    """Transform the torch-layout stacked block params into the kernel's
    streamed layout. Pure XLA ops; runs once per jitted call (and XLA
    hoists it out of any window loop because it only depends on params)."""
    b = params["blocks"]
    depth, e, nh, d = cfg.depth, cfg.embed_dim, cfg.num_heads, cfg.head_dim
    hidden = cfg.mlp_hidden
    hc = _mlp_chunk(hidden)
    nc = hidden // hc

    # All weights are stored so kernel dots are the MXU-natural A @ B form
    # (contraction = LHS lanes x RHS sublanes): a (TQ,E)x(rows,E)
    # lanes-lanes dot_general makes Mosaic transpose the RHS per tile.

    # qkv_w (depth, 3, E_out, E_in) -> (depth, 3, E_in, nh*DP), zero pad
    # the out dim D -> DP (padded columns are exact zeros downstream)
    wqkv = b["qkv_w"].reshape(depth, 3, nh, d, e)
    wqkv = jnp.pad(wqkv, [(0, 0), (0, 0), (0, 0), (0, DP - d), (0, 0)])
    wqkv = wqkv.reshape(depth, 3, nh * DP, e).transpose(0, 1, 3, 2)

    # proj_w (depth, E_out, E_in) -> sublanes = padded input features (nh*DP, E)
    wproj = b["proj_w"].transpose(0, 2, 1).reshape(depth, nh, d, e)
    wproj = jnp.pad(wproj, [(0, 0), (0, 0), (0, DP - d), (0, 0)])
    wproj = wproj.reshape(depth, nh * DP, e)

    wfc1 = b["fc1_w"].reshape(depth, nc, hc, e).transpose(0, 1, 3, 2)  # (depth, nc, E, hc)
    wfc2 = b["fc2_w"].reshape(depth, e, nc, hc).transpose(0, 2, 3, 1)  # (depth, nc, hc, E)

    # vector pack, fp32, all rows padded to W = max(E, nh*DP, hc)
    w = max(e, nh * DP, hc)

    def row(v):  # (depth, k) -> (depth, 1, W)
        return jnp.pad(v.astype(jnp.float32), [(0, 0), (0, w - v.shape[1])])[:, None]

    qb = jnp.pad(b["q_bias"].reshape(depth, nh, d), [(0, 0), (0, 0), (0, DP - d)])
    vb = jnp.pad(b["v_bias"].reshape(depth, nh, d), [(0, 0), (0, 0), (0, DP - d)])
    vec_rows = [
        row(b["norm1_w"]), row(b["norm1_b"]), row(b["norm2_w"]), row(b["norm2_b"]),
        row(b["proj_b"]), row(b["fc2_b"]),
        row(qb.reshape(depth, nh * DP)),
        row(jnp.zeros((depth, nh * DP), jnp.float32)),
        row(vb.reshape(depth, nh * DP)),
    ] + [row(b["fc1_b"][:, c * hc:(c + 1) * hc]) for c in range(nc)]
    vecs = jnp.concatenate(vec_rows, axis=1)  # (depth, 9+nc, W)

    return {"wqkv": wqkv, "wproj": wproj, "wfc1": wfc1, "wfc2": wfc2, "vecs": vecs}


def _gelu(h_f32, dt):
    """Matches ops/conv.py:gelu applied to the (fp32 matmul out + bias) ->
    cast-to-compute-dtype sequence of the XLA block."""
    hd = h_f32.astype(dt)
    if dt == jnp.bfloat16:
        return jax.nn.gelu(hd, approximate=True)
    return jax.nn.gelu(hd, approximate=False)


def _ln_f32(xf, wrow, brow, eps):
    """LayerNorm with fp32 stats; wrow/brow are (1, E) fp32."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * wrow + brow


def _encoder_kernel(
    # inputs
    x_in_ref,      # ANY (B, N, E)
    wqkv_ref,      # (1, 1, E, nh*DP)
    wproj_ref,     # (1, nh*DP, E)
    wfc1_ref,      # (1, 1, E, hc)
    wfc2_ref,      # (1, 1, hc, E)
    vecs_ref,      # (1, nv, W) fp32
    # outputs
    out_ref,       # ANY (B, n_hooks, N, E)
    # scratch
    x_s,           # VMEM (N, E) dt
    xln_s,         # VMEM (N, E) dt
    qkv_s,         # VMEM (3, N, nh*DP) dt (packed: heads on 128-lane stripes)
    macc_s,        # VMEM (N, E) f32
    sem,           # DMA sems (2,)
    *,
    n_tokens: int,
    e: int,
    nh: int,
    scale: float,
    eps: float,
    nc: int,
    hc: int,
    hook_steps: Tuple[int, ...],
    unroll_tiles: bool = False,
    attn_accum: bool = False,
    phase_off: int = 0,
):
    b = pl.program_id(0)
    d = pl.program_id(1)
    p = pl.program_id(2) + phase_off
    last_phase = 3 + nc

    def tiles(body, t=TQ):
        """Loop over token tiles of size t: static unroll or fori."""
        nt = n_tokens // t
        if unroll_tiles:
            for qt in range(nt):
                body(qt, 0)
        else:
            jax.lax.fori_loop(0, nt, body, 0, unroll=False)

    def tq(qt, t=TQ):
        return pl.ds(qt * t if isinstance(qt, int) else pl.multiple_of(qt * t, t), t)

    @pl.when((d == 0) & (p == 0))
    def _load_x():
        cp = pltpu.make_async_copy(x_in_ref.at[b], x_s, sem.at[0])
        cp.start()
        cp.wait()

    # ---- phases 0..2: LN1 (p=0 only) + q/k/v projection ----
    for s in range(3):
        @pl.when(p == s)
        def _qkv(s=s):
            wt = wqkv_ref[0, 0]                       # (E, nh*DP)
            bias = vecs_ref[0, 6 + s:7 + s, : nh * DP]  # (1, nh*DP) f32

            def tile(qt, _):
                o = tq(qt)
                if s == 0:
                    xf = x_s[o, :].astype(jnp.float32)
                    y = _ln_f32(xf, vecs_ref[0, 0:1, :e], vecs_ref[0, 1:2, :e], eps)
                    xln = y.astype(x_s.dtype)
                    xln_s[o, :] = xln
                else:
                    xln = xln_s[o, :]
                acc = jax.lax.dot_general(
                    xln, wt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (TQ, nh*DP)
                # one contiguous write — a per-head scatter layout measured
                # 3.5x slower here (dynamic-sublane stores)
                qkv_s[s, o, :] = (acc + bias).astype(x_s.dtype)
                return 0

            tiles(tile)

    # ---- phase 3: attention + output projection + residual + LN2 ----
    @pl.when(p == 3)
    def _attn():
        projb = vecs_ref[0, 4:5, :e]

        def tile(qt, _):
            o = tq(qt, TQA)
            ovs = []
            proj_acc = None
            for h in range(nh):
                q = qkv_s[0, o, h * DP:(h + 1) * DP]
                k = qkv_s[1, :, h * DP:(h + 1) * DP]
                sm = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # (TQ, N)
                m = jnp.max(sm, axis=-1, keepdims=True)
                pe = jnp.exp(sm - m)
                den = jnp.sum(pe, axis=-1, keepdims=True)
                pmat = (pe / den).astype(x_s.dtype)
                ov = jax.lax.dot_general(
                    pmat, qkv_s[2, :, h * DP:(h + 1) * DP], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(x_s.dtype)  # (TQ, DP)
                if attn_accum:
                    # per-head K=128 projection matmuls accumulated in fp32
                    # registers — no 16-way lane concat
                    ph = jax.lax.dot_general(
                        ov, wproj_ref[0, h * DP:(h + 1) * DP, :], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    proj_acc = ph if proj_acc is None else proj_acc + ph
                else:
                    ovs.append(ov)
            if attn_accum:
                proj = proj_acc
            else:
                ocat = jnp.concatenate(ovs, axis=1)  # (TQ, nh*DP)
                proj = jax.lax.dot_general(
                    ocat, wproj_ref[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (TQ, E)
            branch = (proj + projb).astype(x_s.dtype)
            xnew = x_s[o, :] + branch
            x_s[o, :] = xnew
            y = _ln_f32(xnew.astype(jnp.float32), vecs_ref[0, 2:3, :e], vecs_ref[0, 3:4, :e], eps)
            xln_s[o, :] = y.astype(x_s.dtype)
            return 0

        tiles(tile, TQA)

    # ---- phases 4..: MLP chunks ----
    for c in range(nc):
        @pl.when(p == 4 + c)
        def _mlp(c=c):
            f1b = vecs_ref[0, 9 + c:10 + c, :hc]
            fc2b = vecs_ref[0, 5:6, :e]

            def tile(qt, _):
                o = tq(qt)
                xln = xln_s[o, :]
                h1 = jax.lax.dot_general(
                    xln, wfc1_ref[0, 0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + f1b
                g = _gelu(h1, x_s.dtype)
                part = jax.lax.dot_general(
                    g, wfc2_ref[0, 0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (TQ, E)
                if c == 0:
                    macc_s[o, :] = part
                else:
                    macc_s[o, :] += part
                if c == nc - 1:
                    branch = (macc_s[o, :] + fc2b).astype(x_s.dtype)
                    x_s[o, :] = x_s[o, :] + branch
                return 0

            tiles(tile)

    # hook outputs: x after block hd-1 -> out[b, i]
    for i, hd in enumerate(hook_steps):
        @pl.when((d == hd - 1) & (p == last_phase))
        def _hook(i=i):
            cp = pltpu.make_async_copy(x_s, out_ref.at[b, i], sem.at[1])
            cp.start()
            cp.wait()


# tuned on chip (scripts/exp_fused_encoder.py, ROUND_NOTES r5): fori tile
# loops + per-head proj accumulation beat both the unrolled variants and the
# lane-concat (86.6 / 66.8 -> 52.4 ms/window) AND compile 20x faster (22 s
# vs 460 s for unrolled)
UNROLL_TILES = False
ATTN_ACCUM = True


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tokens", "e", "nh", "depth", "scale", "eps", "hook_ends", "interpret",
        "unroll_tiles", "attn_accum", "phase_range",
    ),
)
def _fused_encoder_impl(
    x: jnp.ndarray,          # (B, N, E)
    fused: Dict,             # prepare_fused_params output
    n_tokens: int,
    e: int,
    nh: int,
    depth: int,
    scale: float,
    eps: float,
    hook_ends: Tuple[int, ...],
    interpret: bool = False,
    unroll_tiles: bool | None = None,
    attn_accum: bool | None = None,
    phase_range: Tuple[int, int] | None = None,  # timing experiments only
) -> jnp.ndarray:
    bsz = x.shape[0]
    nc = fused["wfc1"].shape[1]
    hc = fused["wfc1"].shape[3]
    nv = fused["vecs"].shape[1]
    w = fused["vecs"].shape[2]
    nhp = fused["wqkv"].shape[3]  # nh * DP
    unroll_tiles = UNROLL_TILES if unroll_tiles is None else unroll_tiles
    attn_accum = ATTN_ACCUM if attn_accum is None else attn_accum
    p_lo, p_hi = phase_range if phase_range is not None else (0, 4 + nc)
    grid = (bsz, depth, p_hi - p_lo)

    out = pl.pallas_call(
        functools.partial(
            _encoder_kernel,
            n_tokens=n_tokens, e=e, nh=nh, scale=scale, eps=eps,
            nc=nc, hc=hc, hook_steps=hook_ends,
            unroll_tiles=unroll_tiles, attn_accum=attn_accum, phase_off=p_lo,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, len(hook_ends), n_tokens, e), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, e, nhp), lambda b, d, p, _o=p_lo: (d, jnp.minimum(p + _o, 2), 0, 0)),
            pl.BlockSpec((1, nhp, e), lambda b, d, p: (d, 0, 0)),
            pl.BlockSpec((1, 1, e, hc), lambda b, d, p, _n=nc, _o=p_lo: (d, jnp.clip(p + _o - 4, 0, _n - 1), 0, 0)),
            pl.BlockSpec((1, 1, hc, e), lambda b, d, p, _n=nc, _o=p_lo: (d, jnp.clip(p + _o - 4, 0, _n - 1), 0, 0)),
            pl.BlockSpec((1, nv, w), lambda b, d, p: (d, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_tokens, e), x.dtype),
            pltpu.VMEM((n_tokens, e), x.dtype),
            pltpu.VMEM((3, n_tokens, nhp), x.dtype),
            pltpu.VMEM((n_tokens, e), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, fused["wqkv"], fused["wproj"], fused["wfc1"], fused["wfc2"], fused["vecs"])
    return out


def _run_blocks_xla(params: Dict, x: jnp.ndarray, cfg, hook_ends: Tuple[int, ...]) -> jnp.ndarray:
    """Oracle / gradient-recompute path: the unrolled XLA blocks from
    models/encoder.py, returning the same (B, n_hooks, N, E) stack."""
    from l4p_tpu.models.encoder import _block

    feats = []
    for i in range(cfg.depth):
        bp = {k: v[i] for k, v in params["blocks"].items()}
        x = _block(x, bp, cfg)
        if (i + 1) in hook_ends:
            feats.append(x)
    return jnp.stack(feats, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_encoder_blocks(params: Dict, x: jnp.ndarray, cfg, hook_ends: Tuple[int, ...]) -> jnp.ndarray:
    """Run all `cfg.depth` transformer blocks on pre-embedded tokens
    x (B, N, E); returns (B, len(hook_ends), N, E) features where entry i is
    x after block hook_ends[i]-1 (the pre-final-LN feature when
    hook_ends[i] == depth).

    Forward = the Pallas megakernel; backward recomputes through the XLA
    block path (flash-style recompute, nothing saved from the kernel).
    `cfg.flash_interpret` runs the kernel in interpret mode (CPU tests).
    """
    fused = prepare_fused_params(params, cfg)
    return _fused_encoder_impl(
        x, fused, x.shape[1], cfg.embed_dim, cfg.num_heads, cfg.depth,
        cfg.head_dim ** -0.5, cfg.ln_eps, tuple(hook_ends),
        interpret=bool(getattr(cfg, "flash_interpret", False)),
    )


def _fe_fwd(params, x, cfg, hook_ends):
    return fused_encoder_blocks(params, x, cfg, hook_ends), (params, x)


def _fe_bwd(cfg, hook_ends, res, g):
    params, x = res
    _, vjp = jax.vjp(lambda p_, x_: _run_blocks_xla(p_, x_, cfg, hook_ends), params, x)
    return vjp(g)


fused_encoder_blocks.defvjp(_fe_fwd, _fe_bwd)
