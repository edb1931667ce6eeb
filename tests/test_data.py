"""Data pipeline parity vs the reference L4PDataset base class
(deterministic settings: center crop, start_crop_time)."""

import sys
import types

import numpy as np
import pytest
import torch

from tests.oracle import reference_path
from l4p_tpu.data.dataset import L4PData, L4PDataset, collate


def _install_kornia_stub():
    if "kornia" in sys.modules:
        return
    kornia = types.ModuleType("kornia")
    morph = types.ModuleType("kornia.morphology")

    def erosion(x, kernel):
        # binary erosion == min-pool with the structuring element footprint
        pad = kernel.shape[-1] // 2
        xp = torch.nn.functional.pad(x, (pad, pad, pad, pad), mode="replicate")
        return -torch.nn.functional.max_pool2d(-xp, kernel.shape[-1], stride=1)

    morph.erosion = erosion
    kornia.morphology = morph
    sys.modules["kornia"] = kornia
    sys.modules["kornia.morphology"] = morph


_install_kornia_stub()
reference_path()

from l4p.data.l4p_dataset_mini import L4PDataset as RefDataset, L4PData as RefData  # noqa: E402


def make_raw(T=10, H=120, W=160, seed=0, with_seg=True):
    rng = np.random.default_rng(seed)
    rgb = rng.random((3, T, H, W)).astype(np.float32)
    seg = (rng.random((1, T, H, W)) > 0.6).astype(np.float32) if with_seg else None
    k = np.tile(np.array([[100.0, 0, 80, 0], [0, 100, 60, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                         np.float32)[:, :, None], (1, 1, T))
    return rgb, seg, k


class OurDs(L4PDataset):
    def __init__(self, raw, **kw):
        super().__init__(**kw)
        self.raw = raw

    def __len__(self):
        return 1

    def getitem_helper(self, index):
        rgb, seg, k = self.raw
        return L4PData(rgb_b3thw=rgb.copy(), instanceseg_b1thw=None if seg is None else seg.copy(),
                       intrinsics_b44t=k.copy(), seq_name="synthetic")


class RefDs(RefDataset):
    def __init__(self, raw, **kw):
        super().__init__(**kw)
        self.raw = raw

    def __len__(self):
        return 1

    def getitem_helper(self, index):
        rgb, seg, k = self.raw
        return RefData(
            rgb_b3thw=torch.from_numpy(rgb.copy()),
            instanceseg_b1thw=None if seg is None else torch.from_numpy(seg.copy()),
            intrinsics_b44t=torch.from_numpy(k.copy()),
            seq_name="synthetic",
        )


COMMON = dict(
    crop_size=None,
    resize_size=(224, 224),
    center_crop=True,
    start_crop_time=True,
    estimation_directions=[1],
)


@pytest.mark.parametrize("sampling", ["uniform", "uniform_over_seg"])
def test_pipeline_parity(sampling):
    raw = make_raw()
    ours = OurDs(raw, track_2d_querry_sampling_version=sampling, **COMMON)[0]
    ref = RefDs(raw, track_2d_querry_sampling_version=sampling,
                length_mutiply_of=8, **COMMON)[0]

    for key in ["rgb_b3thw", "intrinsics_b44t", "track_2d_pointquerries_bn3",
                "track_2d_pointlabels_bn", "track_2d_valid_bn1t"]:
        r = ref[key].numpy() if torch.is_tensor(ref[key]) else np.asarray(ref[key])
        o = np.asarray(ours[key])
        assert o.shape == r.shape, f"{key}: {o.shape} vs {r.shape}"
        np.testing.assert_allclose(o.astype(np.float32), r.astype(np.float32),
                                   rtol=2e-3, atol=2e-3, err_msg=key)
    assert ours["ori_video_len"] == ref["ori_video_len"]
    # padded to multiple of 8 and square 224
    assert ours["rgb_b3thw"].shape[1] % 8 == 0
    assert ours["rgb_b3thw"].shape[-2:] == (224, 224)


def test_short_video_mirror_pad():
    raw = make_raw(T=5)
    ours = OurDs(raw, track_2d_querry_sampling_version="uniform", **COMMON)[0]
    ref = RefDs(raw, track_2d_querry_sampling_version="uniform", length_mutiply_of=8, **COMMON)[0]
    np.testing.assert_allclose(ours["rgb_b3thw"], ref["rgb_b3thw"].numpy(), rtol=2e-3, atol=2e-3)
    assert ours["rgb_b3thw"].shape[1] == 16


def test_collate_adds_batch_dim():
    raw = make_raw()
    sample = OurDs(raw, track_2d_querry_sampling_version="uniform", **COMMON)[0]
    batch = collate(sample)
    assert batch["rgb_b3thw"].ndim == 5 and batch["rgb_b3thw"].shape[0] == 1
    assert batch["track_2d_pointquerries_bn3"].ndim == 3
