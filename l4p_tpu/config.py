"""Config registry: the reference's YAML schema mapped onto l4p_tpu configs.

Preserves the reference's public config surface (configs/model.yaml parsed by
jsonargparse class_path/init_args trees, reference l4p/models/utils.py:15-60)
so a released L4P YAML drops in unchanged: class_path strings are mapped to
our dataclass configs instead of torch modules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import yaml

from l4p_tpu.checkpoint import (
    convert_dpt,
    convert_encoder,
    convert_track_head,
    state_dict_to_numpy,
)
from l4p_tpu.models.dpt import DPTConfig, init_dpt_params
from l4p_tpu.models.encoder import GIANT, EncoderConfig, init_encoder_params
from l4p_tpu.models.l4p import DenseHeadConfig, L4PConfig
from l4p_tpu.models.sam import SamConfig
from l4p_tpu.models.track import TrackConfig, init_track_params

_DENSE_KINDS = {
    "VideoMAEFlowDPTHead": "flow",
    "VideoMAEDepthDPTHead": "depth",
    "VideoMAEDynMaskDPTHead": "dyn_mask",
    "VideoMAETraj3DDPTHead": "camray",
    "VideoMAECameraDPTHead": "camera_rays",  # raw 6-ch rays (dense_heads.py:220-254)
}

_CAMRAY_DPT_DEFAULTS = dict(
    actpost_scale_factors=((1, 0, 0), (1, 0, 0), (0, 0, 0), (-1, -1, -1)),
    fusion_scale_factors=((1, 1, 1), (1, 1, 1), (2, 1, 1), (2, 2, 2)),
    output_size=(16, 16, 16),
)


def _head_from_yaml(name: str, node: Mapping[str, Any]) -> Any:
    cls = node["class_path"].rsplit(".", 1)[-1]
    args = dict(node.get("init_args", {}))
    if cls == "VideoMAETrack2DSamHead":
        image_size = tuple(args.get("image_size", (16, 224, 224)))
        patch_size = tuple(args.get("patch_size", (2, 14, 14)))
        emb_size = tuple(image_size[i] // patch_size[i] for i in range(3))
        sam = SamConfig(
            embed_dim=args.get("prompt_embed_dim", 1408),
            image_embedding_size=emb_size,
            input_image_size=image_size,
            num_point_embeddings=args.get("num_point_embeddings", 2),
            prompt_using_features=args.get("prompt_using_features", False),
            num_mask_tokens=1 + int(args.get("estimate_vis", False)) + int(args.get("estimate_depth", False)),
            sam_head_depth=args.get("sam_head_depth", 2),
        )
        return TrackConfig(
            task_name=args.get("task_name", "track_2d"),
            image_size=image_size,
            patch_size=patch_size,
            estimate_vis=args.get("estimate_vis", False),
            estimate_depth=args.get("estimate_depth", False),
            modify_pointlabels_for_windowing=args.get("modify_pointlabels_for_windowing", False),
            prompt_using_features=args.get("prompt_using_features", False),
            attend_to_past=args.get("attend_to_past", False),
            depth_fn=args.get("depth_fn", "linear"),
            vis_fn=args.get("vis_fn", "linear"),
            max_queries=args.get("max_queries", 192),
            estimation_directions=tuple(args.get("estimation_directions", [1, -1])),
            sam=sam,
        )
    if cls not in _DENSE_KINDS:
        raise ValueError(f"unknown head class {cls}")
    kind = _DENSE_KINDS[cls]
    # reference derives default hooks from the encoder depth arg:
    # [2d/5, 3d/5, 4d/5, d] (dense_heads.py:42-43)
    d = args.get("depth", 40)
    hooks = tuple(args.get("hooks_idx") or (d * 2 // 5, d * 3 // 5, d * 4 // 5, d))
    out_nchan = 6 if kind in ("camray", "camera_rays") else args.get("out_nchan", 2 if kind == "flow" else 1)
    dpt_kw: Dict[str, Any] = dict(num_channels=out_nchan, hooks=hooks)
    # reference init_arg `embed_dim` sets the encoder token width fed to the
    # DPT (dense_heads.py:27); extension keys allow small test configs
    if "embed_dim" in args:
        dpt_kw["dim_tokens"] = args["embed_dim"]
    for ext in ("layer_dims", "feature_dim", "last_dim"):
        if ext in args:
            dpt_kw[ext] = tuple(args[ext]) if ext == "layer_dims" else args[ext]
    if kind in ("camray", "camera_rays"):
        dpt_kw.update(_CAMRAY_DPT_DEFAULTS)
        for k in ("actpost_scale_factors", "fusion_scale_factors", "output_size"):
            if k in args:
                dpt_kw[k] = tuple(map(tuple, args[k])) if k != "output_size" else tuple(args[k])
    return DenseHeadConfig(
        task_name=args.get("task_name", name),
        kind=kind,
        out_nchan=out_nchan,
        dpt=DPTConfig(**dpt_kw),
        depth_fn=args.get("depth_fn", "linear"),  # reference default (dense_heads.py:155)
        mask_fn=args.get("apply_fn", "linear"),
        align_pre_inverse=args.get("align_window_overlap_fn") == "inverse",
        align_type=args.get("align_type", "affine"),
        use_intrinsics=args.get("use_intrinsics", True),
        fixed_intrinsics=args.get("fixed_intrinsics", False),
    )


def load_model_config(path: str) -> Tuple[L4PConfig, Tuple[str, ...]]:
    """Parse a reference-schema model YAML into (L4PConfig, tasks)."""
    with open(path) as f:
        tree = yaml.safe_load(f)
    init = tree["init_args"]
    tasks = tuple(init["tasks"])
    m = init["l4p_model"]["init_args"]
    modules = m["task_heads"]["init_args"]["modules"]

    heads = []
    track = TrackConfig()
    for name, node in modules.items():
        cfg = _head_from_yaml(name, node)
        if isinstance(cfg, TrackConfig):
            track = cfg
        else:
            heads.append((name, cfg))

    # extension over the reference schema: the encoder is hardcoded to
    # ViT-giant in the reference (l4p_videomae.py:163-186); an optional
    # `encoder:` mapping in l4p_model.init_args overrides it (small configs,
    # tests)
    enc = GIANT
    if "encoder" in m:
        enc = EncoderConfig(**m["encoder"])

    unfreeze = m.get("unfreeze_blocks")
    freeze_heads = m.get("freeze_heads")
    return (
        L4PConfig(
            encoder=enc,
            window_size=tuple(m.get("window_size", (16, 224, 224))),
            window_stride_t=m.get("window_stride_T", 8),
            joint_alignment=m.get("joint_alignment", False),
            heads=tuple(heads),
            track=track,
            freeze_video_encoder=m.get("freeze_video_encoder", False),
            unfreeze_blocks=tuple(unfreeze) if unfreeze is not None else None,
            freeze_heads=tuple(freeze_heads) if freeze_heads else (),
            video_encoder_ckpt_path=m.get("video_encoder_ckpt_path"),
        ),
        tasks,
    )


def init_l4p_params(cfg: L4PConfig, key: jax.Array, dtype=jnp.float32, tasks: Optional[Sequence[str]] = None) -> Dict:
    """Random full-model init (for tests/benchmarks without a checkpoint)."""
    keys = jax.random.split(key, len(cfg.heads) + 2)
    heads: Dict[str, Dict] = {}
    for i, (name, hcfg) in enumerate(cfg.heads):
        if tasks is not None and name not in tasks:
            continue
        heads[name] = init_dpt_params(hcfg.dpt, keys[i], dtype)
    if tasks is None or "track_2d" in tasks:
        heads["track_2d"] = init_track_params(cfg.track, keys[-2], dtype)
    return {
        "video_encoder": init_encoder_params(cfg.encoder, keys[-1], dtype),
        "task_heads": heads,
    }


def convert_l4p(
    state_dict: Mapping,
    cfg: L4PConfig,
    dtype=jnp.float32,
    prefix: str = "l4p_model.",
    strict: bool = True,
) -> Dict:
    """Convert a released Lightning checkpoint's state_dict to our pytree
    (key layout per l4p/models/utils.py:52 and the module tree).

    `strict=True` (default, matching the reference's load_state_dict
    strict=True / `strict_loading` flag, utils.py:52-53 + l4p.py:21) errors
    on BOTH missing keys (raised with the offending key name) and
    unconsumed checkpoint keys — e.g. LayerScale `gamma_1/gamma_2` tensors
    in a checkpoint converted against an init_values=0 config would
    otherwise be dropped silently and produce wrong outputs."""
    from l4p_tpu.checkpoint import TrackedStateDict

    sd = TrackedStateDict(state_dict_to_numpy(state_dict))
    heads: Dict[str, Dict] = {}
    for name, hcfg in cfg.heads:
        hp = f"{prefix}task_heads.{name}.task_head."
        if any(k.startswith(hp) for k in sd):
            heads[name] = convert_dpt(sd, hcfg.dpt, prefix=hp, dtype=dtype)
        elif strict:
            raise KeyError(
                f"checkpoint has no keys for configured head '{name}' "
                f"(prefix '{hp}'); pass strict=False to skip absent heads"
            )
    tp = f"{prefix}task_heads.track_2d."
    if any(k.startswith(tp) for k in sd):
        heads["track_2d"] = convert_track_head(
            sd, prefix=tp, dtype=dtype,
            sam_depth=cfg.track.sam.sam_head_depth,
            num_mask_tokens=cfg.track.num_mask_tokens,
            num_point_embeddings=cfg.track.sam.num_point_embeddings,
            prompt_using_features=cfg.track.prompt_using_features,
            attend_to_past=cfg.track.attend_to_past,
        )
    params = {
        "video_encoder": convert_encoder(sd, cfg.encoder, prefix=f"{prefix}video_encoder.", dtype=dtype),
        "task_heads": heads,
    }
    if strict:
        leftover = sd.unconsumed()
        if leftover:
            shown = ", ".join(leftover[:8]) + (" ..." if len(leftover) > 8 else "")
            raise ValueError(
                f"{len(leftover)} checkpoint key(s) were not consumed by the "
                f"conversion (strict load, reference utils.py:52-53): {shown}. "
                "This usually means a config/checkpoint mismatch (e.g. "
                "LayerScale gammas with init_values=0, cos-attn scale, or an "
                "extra head). Fix the config or pass strict=False."
            )
    return params


def prepare_model(
    model_config_path: str,
    ckpt_path: Optional[str] = None,
    max_queries: Optional[int] = None,
    dtype=jnp.bfloat16,
):
    """Reference-parity entry point (l4p/models/utils.py:15-60): parse the
    YAML, build configs, load + convert the checkpoint (or random-init when
    ckpt_path is None). Returns (params, cfg, tasks)."""
    cfg, tasks = load_model_config(model_config_path)
    if max_queries is not None:
        cfg = dataclasses.replace(cfg, track=dataclasses.replace(cfg.track, max_queries=max_queries))
    if ckpt_path is None:
        params = init_l4p_params(cfg, jax.random.PRNGKey(0), dtype)
        if cfg.video_encoder_ckpt_path:
            params["video_encoder"] = load_video_encoder_ckpt(
                params["video_encoder"], cfg.video_encoder_ckpt_path, cfg.encoder, dtype
            )
    else:
        import torch

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        params = convert_l4p(ckpt["state_dict"], cfg, dtype)
    return params, cfg, tasks


def load_video_encoder_ckpt(enc_params: Dict, path: str, enc_cfg, dtype=jnp.bfloat16) -> Dict:
    """Encoder-only init from a checkpoint, strict=False analog
    (reference l4p_videomae.py:187-191): present tensors overlay the init,
    missing ones keep it, extras are ignored. Accepts torch checkpoints (raw
    state dicts or the usual {'state_dict'|'model'|'module': ...} wrappers)
    AND orbax directories in our own pytree layout — the output of
    scripts/pretrain_mae.py ({'encoder': ...}), closing the
    pretrain -> finetune loop without a torch round-trip."""
    import os

    import torch

    from l4p_tpu.checkpoint import convert_encoder_lenient

    if os.path.isdir(path):
        from l4p_tpu import checkpoint_io

        tree = checkpoint_io.load(path)
        for key in ("encoder", "video_encoder"):
            if isinstance(tree, dict) and key in tree:
                tree = tree[key]
                break

        def overlay(dst, src):
            if isinstance(dst, dict):
                return {
                    k: overlay(v, src[k]) if isinstance(src, dict) and k in src else v
                    for k, v in dst.items()
                }
            if src is not None and getattr(src, "shape", None) == dst.shape:
                return jnp.asarray(src, dtype)
            return dst  # shape mismatch / missing: keep the init (strict=False)

        return overlay(enc_params, tree)

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model", "module"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    sd = state_dict_to_numpy(ckpt)
    # tolerate an 'encoder.' prefix (MAE pretrain checkpoints)
    if not any(k.startswith("blocks.") for k in sd) and any(
        k.startswith("encoder.blocks.") for k in sd
    ):
        sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    return convert_encoder_lenient(sd, enc_cfg, enc_params, dtype=dtype)
