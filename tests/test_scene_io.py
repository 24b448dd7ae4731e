"""Scene layer: PLY roundtrip, COLMAP binary roundtrip, Blender scenes,
model PLY/checkpoint IO."""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from gs2d_tpu.config import ModelParams
from gs2d_tpu.models.gaussians import init_from_pcd
from gs2d_tpu.models.io import (load_checkpoint, load_ply, save_checkpoint,
                                save_ply)
from gs2d_tpu.scene.colmap import (ColmapCamera, ColmapImage, qvec2rotmat,
                                   read_cameras_binary, read_images_binary,
                                   read_points3d_binary, rotmat2qvec,
                                   write_cameras_binary, write_images_binary,
                                   write_points3d_binary)
from gs2d_tpu.scene.ply import (read_point_cloud, read_ply, write_ply,
                                write_point_cloud)
from gs2d_tpu.scene.scene import Scene
from gs2d_tpu.train.optim import init_adam


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.random((50, 3)).astype(np.float32)
    p = str(tmp_path / "pc.ply")
    write_point_cloud(p, pts, cols)
    pts2, cols2, nrm2 = read_point_cloud(p)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    assert np.abs(cols2 - cols).max() < 1 / 255 + 1e-6


def test_colmap_binary_roundtrip(tmp_path):
    cams = {1: ColmapCamera(1, "PINHOLE", 640, 480,
                            np.array([500.0, 500.0, 320.0, 240.0]))}
    q = rotmat2qvec(np.eye(3))
    imgs = {1: ColmapImage(1, q, np.array([0.0, 0.0, 2.0]), 1, "im0.png",
                           np.zeros((5, 2)), np.arange(5, dtype=np.int64))}
    write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
    write_images_binary(imgs, str(tmp_path / "images.bin"))
    xyz = np.random.default_rng(0).normal(size=(20, 3))
    rgb = (np.random.default_rng(1).random((20, 3)) * 255).astype(np.uint8)
    write_points3d_binary(xyz, rgb, str(tmp_path / "points3D.bin"))

    c2 = read_cameras_binary(str(tmp_path / "cameras.bin"))
    # full-fidelity python path keeps the observation tables…
    i2 = read_images_binary(str(tmp_path / "images.bin"), poses_only=False)
    x2, r2, _ = read_points3d_binary(str(tmp_path / "points3D.bin"))
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    np.testing.assert_allclose(i2[1].tvec, [0, 0, 2])
    assert i2[1].name == "im0.png"
    np.testing.assert_array_equal(i2[1].point3d_ids, np.arange(5))
    # …and the default (native-fast when available) path agrees on poses
    i3 = read_images_binary(str(tmp_path / "images.bin"))
    np.testing.assert_allclose(i3[1].qvec, i2[1].qvec)
    np.testing.assert_allclose(i3[1].tvec, i2[1].tvec)
    assert i3[1].name == "im0.png" and i3[1].camera_id == 1
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(r2, rgb)
    np.testing.assert_allclose(qvec2rotmat(i2[1].qvec), np.eye(3),
                               atol=1e-12)


def _make_blender_scene(root, n_frames=3, size=(64, 48)):
    os.makedirs(root / "train", exist_ok=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n_frames):
        img = (rng.random((size[1], size[0], 4)) * 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(root / "train" / f"r_{i}.png")
        theta = i * 0.3
        c2w = np.eye(4)
        c2w[:3, 3] = [4 * math.sin(theta), 0, 4 * math.cos(theta)]
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": 0.9, "frames": frames}
    with open(root / "transforms_train.json", "w") as f:
        json.dump(meta, f)


def test_blender_scene_assembly(tmp_path):
    _make_blender_scene(tmp_path)
    args = ModelParams(source_path=str(tmp_path),
                       model_path=str(tmp_path / "out"))
    scene = Scene(args, capacity=1 << 17, shuffle=False)
    cams = scene.get_train_cameras()
    assert len(cams) == 3
    assert cams[0].image.shape[0] == 3
    assert scene.cameras_extent > 0
    assert int(scene.gaussians.num_active()) == 100_000
    assert os.path.exists(tmp_path / "out" / "cameras.json")


def test_model_ply_and_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    cols = rng.random((30, 3)).astype(np.float32)
    state = init_from_pcd(pts, cols, 64)
    p = str(tmp_path / "pc" / "point_cloud.ply")
    save_ply(state, p)
    s2 = load_ply(p, capacity=64)
    np.testing.assert_allclose(np.asarray(s2.params.xyz[:30]),
                               np.asarray(state.params.xyz[:30]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s2.params.features_dc[:30]),
        np.asarray(state.params.features_dc[:30]), rtol=1e-6)
    assert int(s2.num_active()) == 30

    opt = init_adam(state.params)
    cp = str(tmp_path / "chkpnt.npz")
    save_checkpoint(cp, state, opt, 123, 2.5)
    s3, o3, it, sc = load_checkpoint(cp)
    assert it == 123 and sc == 2.5
    np.testing.assert_allclose(np.asarray(s3.params.rotation),
                               np.asarray(state.params.rotation))


def test_images_text_zero_point_image(tmp_path):
    """COLMAP always writes the POINTS2D line — blank for an image with
    no observations; the pairing must survive it (a dropped blank line
    shifts every subsequent pose)."""
    from gs2d_tpu.scene.colmap import read_images_text
    p = tmp_path / "images.txt"
    p.write_text(
        "# images\n"
        "1 1 0 0 0 0.5 0.5 0.5 1 a.jpg\n"
        "10.0 20.0 7 30.0 40.0 9\n"
        "2 1 0 0 0 1.5 1.5 1.5 1 b.jpg\n"
        "\n"                                   # zero observations
        "3 1 0 0 0 2.5 2.5 2.5 1 c.jpg\n"
        "50.0 60.0 11\n")
    imgs = read_images_text(str(p))
    assert sorted(imgs) == [1, 2, 3]
    assert imgs[2].name == "b.jpg" and len(imgs[2].xys) == 0
    assert imgs[3].name == "c.jpg" and imgs[3].tvec[0] == 2.5


def test_load_ply_grows_past_small_capacity(tmp_path):
    """A densified model routinely exceeds the caller's default capacity
    bucket; load must grow, not assert (render.py of any trained scene)."""
    state = init_from_pcd(np.random.default_rng(0).normal(
        size=(60, 3)).astype(np.float32),
        np.full((60, 3), 0.5, np.float32), 64, seed=0)
    path = str(tmp_path / "pc.ply")
    save_ply(state, path)
    loaded = load_ply(path, capacity=16)      # deliberately too small
    assert loaded.capacity >= 60
    assert int(loaded.num_active()) == 60
