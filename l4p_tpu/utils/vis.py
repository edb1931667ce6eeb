"""Visualization: per-task video panels + 4D reconstruction export.

Host-side equivalents of reference l4p/utils/vis.py (766 LoC): turbo-mapped
depth, Middlebury flow wheel, dyn-mask overlay, rainbow 2D track trails,
horizontal panel concat to mp4 (cv2 instead of mediapy), and .ply point
cloud/camera-frustum export written directly (open3d not required).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# colorization
# ---------------------------------------------------------------------------

def colormap_image(img_hw: np.ndarray, vmin: float = 0.05, vmax: float = 20.0, cmap: str = "turbo") -> np.ndarray:
    """Scalar map -> RGB uint8 via matplotlib colormap (reference clamps
    depth to [0.05, 20], vis.py:64-66)."""
    import matplotlib

    x = np.clip(img_hw, vmin, vmax)
    x = (x - vmin) / max(vmax - vmin, 1e-12)
    rgba = matplotlib.colormaps[cmap](x)
    return (rgba[..., :3] * 255).astype(np.uint8)


def make_colorwheel() -> np.ndarray:
    """Middlebury flow color wheel (55 colors, standard construction)."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    ncols = ry + yg + gc + cb + bm + mr
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:ry, 0] = 255
    wheel[0:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    wheel[col : col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col : col + yg, 1] = 255
    col += yg
    wheel[col : col + gc, 1] = 255
    wheel[col : col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    wheel[col : col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col : col + cb, 2] = 255
    col += cb
    wheel[col : col + bm, 2] = 255
    wheel[col : col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    wheel[col : col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col : col + mr, 0] = 255
    return wheel


_WHEEL = make_colorwheel()


def flow_to_color(flow_2hw: np.ndarray, max_rad: Optional[float] = None) -> np.ndarray:
    """Backward/forward flow (2, H, W) -> RGB uint8, Middlebury convention."""
    u, v = flow_2hw[0], flow_2hw[1]
    rad = np.sqrt(u ** 2 + v ** 2)
    if max_rad is None:
        max_rad = max(rad.max(), 1e-5)
    u, v = u / max_rad, v / max_rad
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    ncols = _WHEEL.shape[0]
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros(u.shape + (3,), np.uint8)
    for c in range(3):
        col0 = _WHEEL[k0, c] / 255.0
        col1 = _WHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        col = np.where(rad <= 1, 1 - rad * (1 - col), col * 0.75)
        img[..., c] = np.floor(255 * col)
    return img


def _track_colors(n: int) -> np.ndarray:
    import matplotlib

    return (matplotlib.colormaps["hsv"](np.linspace(0, 1, max(n, 2), endpoint=False))[:, :3] * 255).astype(np.uint8)


def draw_tracks(
    rgb_thw3: np.ndarray,
    traj_n2t: np.ndarray,
    vis_n1t: Optional[np.ndarray] = None,
    trail: int = 8,
    vis_threshold: float = 0.0,
) -> np.ndarray:
    """Rainbow track trails on video frames (reference plot_2d_tracks,
    vis.py:430-523). vis is a logit; > threshold shows the point."""
    import cv2

    t_total = rgb_thw3.shape[0]
    n = traj_n2t.shape[0]
    colors = _track_colors(n)
    out = rgb_thw3.copy()
    for t in range(t_total):
        frame = np.ascontiguousarray(out[t])
        for i in range(n):
            visible = True if vis_n1t is None else bool(vis_n1t[i, 0, t] > vis_threshold)
            if not visible:
                continue
            x, y = traj_n2t[i, :, t]
            for dt in range(1, trail):
                tp = t - dt
                if tp < 0:
                    break
                if vis_n1t is not None and not (vis_n1t[i, 0, tp] > vis_threshold):
                    break
                x0, y0 = traj_n2t[i, :, tp + 1]
                x1, y1 = traj_n2t[i, :, tp]
                cv2.line(frame, (int(x0), int(y0)), (int(x1), int(y1)),
                         tuple(int(c) for c in colors[i]), 1, cv2.LINE_AA)
            cv2.circle(frame, (int(x), int(y)), 2, tuple(int(c) for c in colors[i]), -1, cv2.LINE_AA)
        out[t] = frame
    return out


# ---------------------------------------------------------------------------
# panel video
# ---------------------------------------------------------------------------

def generate_video_visualizations(
    batch: Dict[str, np.ndarray],
    out: Dict[str, np.ndarray],
    tasks: Sequence[str],
    out_path: str,
    fps: int = 15,
    dyn_mask_threshold: float = 0.85,
) -> str:
    """Horizontal per-task panels -> mp4 (reference
    generate_video_visualizations, vis.py:34-104)."""
    import cv2

    rgb = np.asarray(batch["rgb_b3thw"][0], np.float32)  # (3,T,H,W)
    mean = np.asarray(batch["rgb_mean_b3111"][0]) if "rgb_mean_b3111" in batch else 0.0
    std = np.asarray(batch["rgb_std_b3111"][0]) if "rgb_std_b3111" in batch else 1.0
    rgb = np.clip(rgb * std + mean, 0, 1)
    video = (rgb.transpose(1, 2, 3, 0) * 255).astype(np.uint8)  # (T,H,W,3)
    t_total = video.shape[0]
    panels: List[np.ndarray] = [video]

    if "depth" in tasks and "depth_est_b1thw" in out:
        d = np.asarray(out["depth_est_b1thw"][0, 0], np.float32)
        panels.append(np.stack([colormap_image(d[t]) for t in range(t_total)]))
    if "flow_2d_backward" in tasks and "flow_2d_backward_est_b2thw" in out:
        fl = np.asarray(out["flow_2d_backward_est_b2thw"][0], np.float32)
        mx = max(float(np.sqrt((fl ** 2).sum(0)).max()), 1e-5)
        panels.append(np.stack([flow_to_color(fl[:, t], mx) for t in range(t_total)]))
    if "dyn_mask" in tasks and "dyn_mask_est_b1thw" in out:
        m = np.asarray(out["dyn_mask_est_b1thw"][0, 0], np.float32)
        prob = 1.0 / (1.0 + np.exp(-m))
        mask = (prob > dyn_mask_threshold).astype(np.uint8) * 255  # vis.py:82-84
        panels.append(np.stack([np.repeat(mask[t][..., None], 3, -1) for t in range(t_total)]))
    if "track_2d" in tasks and "track_2d_traj_est_bn2t" in out:
        traj = np.asarray(out["track_2d_traj_est_bn2t"][0], np.float32)
        # no visibility estimate -> draw everything (draw_tracks treats
        # vis=None as always-visible)
        vis_arr = out.get("track_2d_vis_est_bn1t")
        vis = None if vis_arr is None else np.asarray(vis_arr[0])
        panels.append(draw_tracks(video, traj, vis))

    frames = np.concatenate(panels, axis=2)  # widthwise
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for t in range(t_total):
        vw.write(frames[t][:, :, ::-1])
    vw.release()
    return out_path


# ---------------------------------------------------------------------------
# 4D export (.ply, no open3d)
# ---------------------------------------------------------------------------

def write_ply(path: str, xyz_n3: np.ndarray, rgb_n3: Optional[np.ndarray] = None) -> None:
    """Binary-little-endian PLY point cloud writer."""
    n = xyz_n3.shape[0]
    has_c = rgb_n3 is not None
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if has_c:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header += ["end_header"]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if has_c:
            dt = np.dtype([("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            arr = np.empty(n, dt)
            arr["xyz"] = xyz_n3.astype(np.float32)
            arr["rgb"] = rgb_n3.astype(np.uint8)
        else:
            dt = np.dtype([("xyz", np.float32, 3)])
            arr = np.empty(n, dt)
            arr["xyz"] = xyz_n3.astype(np.float32)
        f.write(arr.tobytes())


def camera_frustum_points(
    pose_44: np.ndarray, k_44: np.ndarray, hw: Tuple[int, int] = (224, 224),
    scale: float = 0.2, points_per_edge: int = 12,
) -> np.ndarray:
    """Camera frustum as a polyline point set in world space (reference
    create_camera_frustum, vis.py:529-620, sampled as points for PLY)."""
    h, w = hw
    k = k_44[:3, :3]
    corners_px = np.array([[0, 0, 1], [w, 0, 1], [w, h, 1], [0, h, 1]], np.float32)
    rays = (np.linalg.inv(k) @ corners_px.T).T * scale  # (4,3) at depth `scale`
    ctr = np.zeros((1, 3), np.float32)
    pts = [ctr]
    t = np.linspace(0, 1, points_per_edge)[:, None]
    for i in range(4):
        pts.append(ctr + t * rays[i][None])  # center -> corner
        pts.append(rays[i][None] * (1 - t) + rays[(i + 1) % 4][None] * t)  # rim
    cam_pts = np.concatenate(pts, 0)
    world = cam_pts @ pose_44[:3, :3].T + pose_44[:3, 3]
    return world


def generate_camera_trajectory_ply(
    out: Dict[str, np.ndarray], path: str, hw: Tuple[int, int] = (224, 224)
) -> str:
    """All frames' frusta in one PLY, colored by time (reference
    generate_video_camera_trajectory, vis.py:623-680)."""
    import matplotlib

    pose = np.asarray(out["traj3d_est_b16t"], np.float32)
    t_total = pose.shape[-1]
    pose = pose.reshape(4, 4, t_total)
    k = np.asarray(out["traj3d_intrinsics_est_b16t"], np.float32).reshape(4, 4, t_total)
    cmap = matplotlib.colormaps["viridis"]
    pts, cols = [], []
    for t in range(t_total):
        p = camera_frustum_points(pose[:, :, t], k[:, :, t], hw)
        pts.append(p)
        c = (np.array(cmap(t / max(t_total - 1, 1))[:3]) * 255).astype(np.uint8)
        cols.append(np.tile(c, (p.shape[0], 1)))
    write_ply(path, np.concatenate(pts), np.concatenate(cols))
    return path


def generate_3d_track_ply(
    batch: Dict[str, np.ndarray], out: Dict[str, np.ndarray], out_dir: str,
    vis_threshold: float = 0.0, rescale_to_dense_depth: bool = True,
) -> List[str]:
    """3D track trails: 2D tracks + track depth unprojected to world
    (reference generate_3d_track_point_clouds, vis.py:683-766), with track
    depth rescaled to the dense depth via median ratio at visible samples
    (vis.py:149-169)."""
    import jax.numpy as jnp

    from l4p_tpu.geometry.core import generate_3d_track_point_map

    traj = np.asarray(out["track_2d_traj_est_bn2t"], np.float32)
    tdep = np.asarray(out["track_2d_depth_est_bn1t"], np.float32)
    vis = np.asarray(out["track_2d_vis_est_bn1t"], np.float32)
    t_total = traj.shape[-1]
    pose = np.asarray(out["traj3d_est_b16t"], np.float32).reshape(1, 4, 4, t_total)
    if "traj3d_intrinsics_est_b16t" in out:
        k_src = out["traj3d_intrinsics_est_b16t"]
    else:
        k_src = np.asarray(batch["intrinsics_b44t"])[:1].reshape(1, 16, t_total)
    k = np.asarray(k_src, np.float32).reshape(1, 4, 4, t_total)

    if rescale_to_dense_depth and "depth_est_b1thw" in out:
        dense = np.asarray(out["depth_est_b1thw"], np.float32)
        xs = np.clip(traj[0, :, 0].round().astype(int), 0, dense.shape[-1] - 1)
        ys = np.clip(traj[0, :, 1].round().astype(int), 0, dense.shape[-2] - 1)
        t_idx = np.broadcast_to(np.arange(t_total), xs.shape)
        dense_at = dense[0, 0, t_idx, ys, xs]
        m = vis[0, :, 0] > vis_threshold
        if m.sum() > 0:
            ratio = np.median(dense_at[m] / np.maximum(tdep[0, :, 0][m], 1e-6))
            tdep = tdep * ratio

    xyz = np.asarray(
        generate_3d_track_point_map(jnp.asarray(traj), jnp.asarray(tdep), jnp.asarray(k), jnp.asarray(pose))
    )  # (1, N, 3, T)
    colors = _track_colors(traj.shape[1])
    paths = []
    os.makedirs(out_dir, exist_ok=True)
    for t in range(t_total):
        keep = vis[0, :, 0, t] > vis_threshold
        p = os.path.join(out_dir, f"tracks_{t:04d}.ply")
        write_ply(p, xyz[0, keep, :, t], colors[keep])
        paths.append(p)
    return paths


def serve_point_clouds(ply_dir: str, port: int = 8001):
    """Minimal web point-cloud browser (replaces the reference's viser
    server, viser.py:14-89): serves the .ply files plus a Three.js viewer
    page with a frame slider."""
    import http.server
    import functools as ft

    html = """<!doctype html><html><body style="margin:0">
<div style="position:fixed;z-index:1;color:#fff;font-family:monospace;padding:8px">
 frame <input id=s type=range min=0 max=0 value=0 style="width:300px"> <span id=l></span></div>
<script type="module">
import * as THREE from 'https://unpkg.com/three@0.160.0/build/three.module.js';
import {PLYLoader} from 'https://unpkg.com/three@0.160.0/examples/jsm/loaders/PLYLoader.js';
import {OrbitControls} from 'https://unpkg.com/three@0.160.0/examples/jsm/controls/OrbitControls.js';
const files = await (await fetch('files.json')).json();
const scene = new THREE.Scene();
const cam = new THREE.PerspectiveCamera(60, innerWidth/innerHeight, 0.01, 100);
cam.position.z = 2;
const r = new THREE.WebGLRenderer(); r.setSize(innerWidth, innerHeight);
document.body.appendChild(r.domElement);
new OrbitControls(cam, r.domElement);
const loader = new PLYLoader(); let pc = null;
const slider = document.getElementById('s'); slider.max = files.length - 1;
async function show(i){
  const g = await loader.loadAsync(files[i]);
  if (pc) scene.remove(pc);
  pc = new THREE.Points(g, new THREE.PointsMaterial({size:0.01, vertexColors:true}));
  scene.add(pc); document.getElementById('l').textContent = files[i];
}
slider.oninput = () => show(+slider.value);
show(0);
(function anim(){ requestAnimationFrame(anim); r.render(scene, cam); })();
</script></body></html>"""

    import json as _json

    plys = sorted(f for f in os.listdir(ply_dir) if f.endswith(".ply"))
    with open(os.path.join(ply_dir, "index.html"), "w") as f:
        f.write(html)
    with open(os.path.join(ply_dir, "files.json"), "w") as f:
        _json.dump(plys, f)
    handler = ft.partial(http.server.SimpleHTTPRequestHandler, directory=ply_dir)
    httpd = http.server.ThreadingHTTPServer(("", port), handler)
    print(f"point-cloud viewer: http://localhost:{port}/ ({len(plys)} frames)")
    return httpd  # caller runs httpd.serve_forever()


def generate_4d_visualization(
    batch: Dict[str, np.ndarray],
    out: Dict[str, np.ndarray],
    out_dir: str,
    depth_clip: Tuple[float, float] = (0.05, 20.0),
    stride: int = 1,
) -> List[str]:
    """Per-frame world point clouds from depth + estimated pose/K
    (reference generate_4D_visualization, vis.py:107-221)."""
    from l4p_tpu.geometry.core import generate_point_map
    import jax.numpy as jnp

    depth = np.asarray(out["depth_est_b1thw"], np.float32)
    pose = np.asarray(out["traj3d_est_b16t"], np.float32)
    t_total = depth.shape[2]
    if "traj3d_intrinsics_est_b16t" in out:
        k_src = out["traj3d_intrinsics_est_b16t"]
    else:
        k_src = np.asarray(batch["intrinsics_b44t"])[:1].reshape(1, 16, t_total)
    k = np.asarray(k_src, np.float32).reshape(1, 4, 4, t_total)
    pose = pose.reshape(1, 4, 4, t_total)

    pm = np.asarray(generate_point_map(jnp.asarray(depth), jnp.asarray(k), jnp.asarray(pose)))

    rgb = np.asarray(batch["rgb_b3thw"][0], np.float32)
    mean = np.asarray(batch["rgb_mean_b3111"][0]) if "rgb_mean_b3111" in batch else 0.0
    std = np.asarray(batch["rgb_std_b3111"][0]) if "rgb_std_b3111" in batch else 1.0
    rgb = np.clip(rgb * std + mean, 0, 1)

    paths = []
    for t in range(0, t_total, stride):
        pts = pm[0, :, t].reshape(3, -1).T
        cols = (rgb[:, t].reshape(3, -1).T * 255).astype(np.uint8)
        keep = (depth[0, 0, t].reshape(-1) > depth_clip[0]) & (depth[0, 0, t].reshape(-1) < depth_clip[1])
        p = os.path.join(out_dir, f"pointcloud_{t:04d}.ply")
        write_ply(p, pts[keep], cols[keep])
        paths.append(p)
    return paths
