"""Test-only harness to run the PyTorch reference (read-only at
/root/reference) as a golden oracle.

timm / lightning / skimage are not installed in this image; the reference
encoder needs 4 trivial timm symbols, stubbed here before adding the
reference to sys.path. Reference code is executed, never copied.
"""

import math
import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")

    def drop_path(x, drop_prob=0.0, training=False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        mask.floor_()
        return x.div(keep) * mask

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return tensor.normal_(mean, std).clamp_(a, b)

    def register_model(fn=None, *a, **k):
        if fn is None:
            return lambda f: f
        return fn

    layers.drop_path = drop_path
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    registry.register_model = register_model
    models.layers = layers
    models.registry = registry
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers
    sys.modules["timm.models.registry"] = registry


def _install_skimage_stub():
    """The reference aligner imports skimage at module load
    (l4p/models/aligner.py:12-13); only the import must succeed — tests that
    need RANSAC behavior use our own implementation as the subject and
    statistical checks as the oracle."""
    if "skimage" in sys.modules:
        return
    skimage = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")
    transform = types.ModuleType("skimage.transform")

    def ransac(*a, **k):
        raise NotImplementedError("skimage stub: ransac not available in test image")

    class SimilarityTransform:
        def __init__(self, *a, **k):
            raise NotImplementedError("skimage stub")

    measure.ransac = ransac
    transform.SimilarityTransform = SimilarityTransform
    skimage.measure = measure
    skimage.transform = transform
    sys.modules["skimage"] = skimage
    sys.modules["skimage.measure"] = measure
    sys.modules["skimage.transform"] = transform


def reference_path():
    _install_timm_stub()
    _install_skimage_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT
