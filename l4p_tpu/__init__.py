"""l4p_tpu — TPU-native framework for unified low-level 4D perception.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of NVlabs/L4P
(reference: /root/reference): a frozen-size video ViT encoder shared by
per-task heads predicting depth, backward optical flow, dynamic-motion
segmentation, camera pose (Plucker camrays) and 2D/3D point tracks from
monocular RGB video, with sliding-window long-video stitching.

Design principles (TPU-first, not a port):
  * functional core: params are pytrees, every model is a pure ``apply`` fn
  * static shapes everywhere; windows and query chunks are padded/batched
  * all geometry solvers (RANSAC Sim(3), homography DLT+RQ, Kabsch, skew-line
    least squares) run batched on device — no CPU round trips
  * sliding-window stitching is a ``lax.scan``; per-window encoder forwards
    are batched and shardable over a device mesh
"""

__version__ = "0.1.0"

# curated public API — the surfaces docs/serving.md and the README teach.
# Submodules import each other directly (never package attributes), so these
# re-exports create no cycles.
from l4p_tpu.config import init_l4p_params, load_model_config, prepare_model  # noqa: E402,F401
from l4p_tpu.inference import InferenceSession, get_forward_fn, run_sequence  # noqa: E402,F401
from l4p_tpu.models.l4p import L4PConfig, l4p_forward  # noqa: E402,F401
from l4p_tpu.streaming import StreamingL4P, assemble_emissions  # noqa: E402,F401
