"""Visualization layer: panel video, PLY exports, flow wheel, viewer assets."""

import os

import numpy as np

from l4p_tpu.utils import vis as V


def make_out(T=4, N=3, H=28, W=28):
    rng = np.random.default_rng(0)
    pose = np.tile(np.eye(4, dtype=np.float32).reshape(16, 1), (1, T))[None]
    k = np.zeros((1, 16, T), np.float32)
    kk = np.array([[30, 0, 14, 0], [0, 30, 14, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    k[0] = np.tile(kk.reshape(16, 1), (1, T))
    return {
        "depth_est_b1thw": rng.uniform(1, 5, (1, 1, T, H, W)).astype(np.float32),
        "flow_2d_backward_est_b2thw": rng.standard_normal((1, 2, T, H, W)).astype(np.float32),
        "dyn_mask_est_b1thw": rng.standard_normal((1, 1, T, H, W)).astype(np.float32),
        "track_2d_traj_est_bn2t": rng.uniform(0, W, (1, N, 2, T)).astype(np.float32),
        "track_2d_vis_est_bn1t": rng.standard_normal((1, N, 1, T)).astype(np.float32),
        "track_2d_depth_est_bn1t": rng.uniform(1, 3, (1, N, 1, T)).astype(np.float32),
        "traj3d_est_b16t": pose,
        "traj3d_intrinsics_est_b16t": k,
    }


def make_batch(T=4, H=28, W=28):
    rng = np.random.default_rng(1)
    kk = np.array([[30, 0, 14, 0], [0, 30, 14, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    return {
        "rgb_b3thw": rng.standard_normal((1, 3, T, H, W)).astype(np.float32),
        "intrinsics_b44t": np.tile(kk[None, :, :, None], (1, 1, 1, T)),
        "rgb_mean_b3111": np.full((1, 3, 1, 1, 1), 0.45, np.float32),
        "rgb_std_b3111": np.full((1, 3, 1, 1, 1), 0.22, np.float32),
    }


def test_panel_video(tmp_path):
    out = make_out()
    batch = make_batch()
    p = V.generate_video_visualizations(
        batch, out, ("depth", "flow_2d_backward", "dyn_mask", "track_2d"), str(tmp_path / "p.mp4")
    )
    assert os.path.getsize(p) > 1000


def test_flow_wheel_properties():
    # zero flow -> white-ish center color everywhere
    img = V.flow_to_color(np.zeros((2, 8, 8), np.float32), max_rad=1.0)
    assert img.shape == (8, 8, 3) and (img > 240).all()


def test_ply_exports(tmp_path):
    out = make_out()
    batch = make_batch()
    plys = V.generate_4d_visualization(batch, out, str(tmp_path), stride=2)
    assert len(plys) == 2 and all(os.path.getsize(p) > 100 for p in plys)
    cam = V.generate_camera_trajectory_ply(out, str(tmp_path / "cams.ply"))
    assert os.path.getsize(cam) > 100
    tracks = V.generate_3d_track_ply(batch, out, str(tmp_path / "tr"), vis_threshold=-10)
    assert len(tracks) == 4
    # ply parses: header says vertex count
    head = open(plys[0], "rb").read(200).decode(errors="ignore")
    assert "element vertex" in head and "binary_little_endian" in head


def test_viewer_assets(tmp_path):
    out = make_out()
    batch = make_batch()
    V.generate_4d_visualization(batch, out, str(tmp_path), stride=2)
    httpd = V.serve_point_clouds(str(tmp_path), port=0)
    try:
        assert os.path.exists(tmp_path / "index.html")
        assert os.path.exists(tmp_path / "files.json")
    finally:
        httpd.server_close()
