"""ctypes binding + on-demand build of the native preprocessing library.

Builds preprocess.cpp with g++ on first use (cached next to the source);
every entry point has a numpy fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_SO = os.path.join(_HERE, "build", "libpreprocess.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _host_tag() -> str:
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = [ln for ln in f if ln.startswith("flags")][0]
        import hashlib

        cpu = hashlib.sha1(flags.encode()).hexdigest()[:12]
    except Exception:
        cpu = "unknown"
    return f"{platform.machine()}-{cpu}"


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        # -march=native binaries are host-specific: a .so copied from another
        # machine could die with SIGILL (uncatchable) — rebuild unless the
        # recorded host tag matches
        tag_file = _SO + ".host"
        tag_ok = os.path.exists(tag_file) and open(tag_file).read() == _host_tag()
        os.makedirs(os.path.dirname(_SO), exist_ok=True)
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC) or not tag_ok:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
                 "-o", _SO, _SRC, "-lpthread"],
                check=True, capture_output=True,
            )
            with open(_SO + ".host", "w") as f:
                f.write(_host_tag())
        lib = ctypes.CDLL(_SO)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.normalize_thwc_u8_to_cthw_f32.argtypes = [u8p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p]
        lib.resize_bilinear_f32.argtypes = [f32p, f32p] + [ctypes.c_int] * 5
        lib.resize_nearest_f32.argtypes = [f32p, f32p] + [ctypes.c_int] * 5
        lib.mirror_pad_time_f32.argtypes = [f32p, f32p] + [ctypes.c_int] * 4
        return lib
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def normalize_video(frames_thwc_u8: np.ndarray, mean3: np.ndarray, std3: np.ndarray) -> np.ndarray:
    """(T,H,W,3) uint8 -> (3,T,H,W) float32 normalized."""
    lib = get_lib()
    t, h, w, _ = frames_thwc_u8.shape
    if lib is None:
        x = frames_thwc_u8.astype(np.float32) / 255.0
        x = (x - mean3) / std3
        return np.ascontiguousarray(x.transpose(3, 0, 1, 2))
    out = np.empty((3, t, h, w), np.float32)
    lib.normalize_thwc_u8_to_cthw_f32(
        np.ascontiguousarray(frames_thwc_u8), out, t, h, w,
        np.ascontiguousarray(mean3, np.float32), np.ascontiguousarray(std3, np.float32),
    )
    return out


def resize_planes(x: np.ndarray, size, mode: str = "bilinear") -> np.ndarray:
    """x: (..., H, W) float32 -> (..., H2, W2). Torch index conventions."""
    lib = get_lib()
    h, w = x.shape[-2:]
    h2, w2 = size
    lead = x.shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    if lib is None:
        from l4p_tpu.data.dataset import _resize_chw

        return _resize_chw(x, (h2, w2), "trilinear" if mode == "bilinear" else mode)
    src = np.ascontiguousarray(x.reshape(n, h, w), np.float32)
    dst = np.empty((n, h2, w2), np.float32)
    fn = lib.resize_bilinear_f32 if mode == "bilinear" else lib.resize_nearest_f32
    fn(src, dst, n, h, w, h2, w2)
    return dst.reshape(*lead, h2, w2)


def mirror_pad_time(x_cthw: np.ndarray) -> np.ndarray:
    """(C,T,H,W) -> (C,2T-1,H,W) temporal mirror."""
    lib = get_lib()
    c, t, h, w = x_cthw.shape
    if lib is None:
        return np.concatenate([x_cthw, np.flip(x_cthw, 1)[:, 1:]], 1)
    out = np.empty((c, 2 * t - 1, h, w), np.float32)
    lib.mirror_pad_time_f32(np.ascontiguousarray(x_cthw, np.float32), out, c, t, h, w)
    return out
