"""Concrete datasets: DAVIS frame dirs, generic videos (cv2), Dycheck.

Mirrors reference l4p/data/{davis,video_dataset,dycheck_dataset}.py with
cv2.VideoCapture instead of mediapy (not installed) and PIL for stills,
including the antialias downsize-then-upsize trick (davis.py:86-90).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image
from PIL.ImageOps import exif_transpose

from l4p_tpu.data.dataset import L4PData, L4PDataset


def _pil_antialias(img: Image.Image, resize_size: Tuple[int, int]) -> Image.Image:
    """Downsize then upsize at original resolution with bilinear — the
    reference's antialias trick (davis.py:86-90)."""
    full = img.size
    img = img.resize(resize_size, resample=Image.Resampling.BILINEAR)
    return img.resize(full, resample=Image.Resampling.BILINEAR)


def _to_chw(img: Image.Image) -> np.ndarray:
    a = np.asarray(img, np.float32) / 255.0
    if a.ndim == 2:
        a = a[:, :, None]
    return a.transpose(2, 0, 1)


def _dummy_intrinsics(h: int, w: int, t: int) -> np.ndarray:
    f = float(min(h, w))
    k = np.array(
        [[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
    )
    return np.tile(k[:, :, None], (1, 1, t))


class DavisDataset(L4PDataset):
    """DAVIS-format frame directories (reference davis.py:24-141)."""

    def __init__(
        self,
        data_root: str,
        stride: int = 1,
        crop_size: Optional[Tuple[int, int, int]] = None,
        resize_size: Tuple[int, int] = (224, 224),
        center_crop: bool = True,
        start_crop_time: bool = True,
        estimation_directions: List[int] = [1],
        track_2d_querry_sampling_spacing: float = 0.02,
        **kw,
    ):
        super().__init__(
            crop_size=crop_size,
            center_crop=center_crop,
            start_crop_time=start_crop_time,
            resize_size=resize_size,
            estimation_directions=estimation_directions,
            track_2d_querry_sampling_version="uniform_over_seg",
            track_2d_querry_sampling_spacing=track_2d_querry_sampling_spacing,
            **kw,
        )
        self.data_root = data_root
        self.stride = stride
        self.scene_list = sorted(glob.glob(os.path.join(data_root, "JPEGImages/480p/*")))

    def __len__(self):
        return len(self.scene_list)

    def getitem_helper(self, index: int) -> L4PData:
        scene = self.scene_list[index]
        seq_name = os.path.basename(scene)
        n = len(glob.glob(os.path.join(scene, "*.jpg")))
        rgbs, instances = [], []
        for i in range(0, n, self.stride):
            p = os.path.join(scene, "%05d.jpg" % i)
            rgb = _pil_antialias(Image.open(p), self.resize_size)
            rgbs.append(_to_chw(rgb)[:3, None])
            ip = p.replace("JPEGImages", "Annotations").replace("jpg", "png")
            if os.path.isfile(ip):
                inst = _pil_antialias(Image.open(ip), self.resize_size)
                instances.append(_to_chw(inst)[:1, None])
            else:
                instances.append(np.zeros_like(rgbs[-1][:1]))
        rgb = np.concatenate(rgbs, 1)
        inst = (np.concatenate(instances, 1).mean(0, keepdims=True) > 0).astype(np.float32)
        _, t, h, w = rgb.shape
        return L4PData(
            rgb_b3thw=rgb,
            intrinsics_b44t=_dummy_intrinsics(h, w, t),
            instanceseg_b1thw=inst,
            seq_name=seq_name,
        )


class VideoDataset(L4PDataset):
    """Generic videos via cv2 (reference video_dataset.py:17-137)."""

    def __init__(
        self,
        video_paths: List[str],
        max_frames: int = 192,
        stride: int = 1,
        crop_size: Optional[Tuple[int, int, int]] = None,
        resize_size: Tuple[int, int] = (224, 224),
        center_crop: bool = True,
        start_crop_time: bool = True,
        estimation_directions: List[int] = [1],
        track_2d_querry_sampling_spacing: float = 0.02,
        **kw,
    ):
        super().__init__(
            crop_size=crop_size,
            center_crop=center_crop,
            start_crop_time=start_crop_time,
            resize_size=resize_size,
            estimation_directions=estimation_directions,
            track_2d_querry_sampling_version="uniform",
            track_2d_querry_sampling_spacing=track_2d_querry_sampling_spacing,
            **kw,
        )
        self.video_paths = video_paths
        self.max_frames = max_frames
        self.stride = stride

    def __len__(self):
        return len(self.video_paths)

    def getitem_helper(self, index: int) -> L4PData:
        import cv2

        path = self.video_paths[index]
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise FileNotFoundError(f"VideoDataset: cannot open video {path!r}")
        rgbs = []
        count = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            img = Image.fromarray(frame[:, :, ::-1])  # BGR -> RGB
            img = _pil_antialias(img, self.resize_size)
            rgbs.append(_to_chw(img)[:3, None])
            count += 1
            if count == self.max_frames - 1:  # reference off-by-design (video_dataset.py:99)
                break
        cap.release()
        if not rgbs:
            raise ValueError(f"VideoDataset: no decodable frames in {path!r} (unsupported codec?)")
        rgb = np.concatenate(rgbs, 1)[:, :: self.stride]
        _, t, h, w = rgb.shape
        return L4PData(
            rgb_b3thw=rgb,
            intrinsics_b44t=_dummy_intrinsics(h, w, t),
            instanceseg_b1thw=np.zeros((1, t, h, w), np.float32),
            seq_name=os.path.basename(path),
        )


class DycheckDataset(L4PDataset):
    """Dycheck sequences with real intrinsics (reference
    dycheck_dataset.py:17-109)."""

    def __init__(
        self,
        data_root: str,
        stride: int = 1,
        crop_size: Optional[Tuple[int, int, int]] = None,
        resize_size: Tuple[int, int] = (224, 224),
        center_crop: bool = True,
        start_crop_time: bool = True,
        estimation_directions: List[int] = [1],
        resize_mode: Optional[Dict[str, str]] = None,
        track_2d_querry_sampling_spacing: float = 0.02,
        **kw,
    ):
        super().__init__(
            crop_size=crop_size,
            center_crop=center_crop,
            start_crop_time=start_crop_time,
            resize_size=resize_size,
            resize_mode=resize_mode or {"depth_b1thw": "trilinear"},
            estimation_directions=estimation_directions,
            track_2d_querry_sampling_version="uniform",
            track_2d_querry_sampling_spacing=track_2d_querry_sampling_spacing,
            **kw,
        )
        self.data_root = data_root
        self.stride = stride
        self.seq_list = sorted(glob.glob(os.path.join(data_root, "*")))

    def __len__(self):
        return len(self.seq_list)

    def getitem_helper(self, index: int) -> L4PData:
        dir_path = self.seq_list[index]
        seq = os.path.basename(dir_path)
        imgs = sorted(glob.glob(os.path.join(dir_path, "dense", "images", "*.png")))[:: self.stride]
        rgbs = []
        for p in imgs:
            img = exif_transpose(Image.open(p)).convert("RGB")
            rgbs.append(_to_chw(img)[:3, None])
        rgb = np.concatenate(rgbs, 1)
        t = rgb.shape[1]

        with open(os.path.join(dir_path, "calibration.txt")) as f:
            fx, fy, cx, cy = (float(x) for x in f.readlines()[0].split(" ")[:4])
        k = np.eye(4, dtype=np.float32)
        k[0, 0], k[1, 1], k[0, 2], k[1, 2] = fx, fy, cx, cy
        return L4PData(
            rgb_b3thw=rgb,
            intrinsics_b44t=np.tile(k[:, :, None], (1, 1, t)),
            extrinsics_b44t=np.tile(np.eye(4, dtype=np.float32)[:, :, None], (1, 1, t)),
            seq_name=f"Dycheck_{seq}",
        )
