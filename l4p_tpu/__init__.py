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
