"""Dataset tests: COLMAP binary round-trip, procedural loaders, ray gen."""

import os
import struct
import tempfile

import numpy as np

from nerfacc_tpu.datasets.colmap import Camera, load_sparse
from nerfacc_tpu.datasets.nerf_360_v2 import similarity_from_cameras


def _write_cameras_bin(path, cams):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        model_ids = {"SIMPLE_PINHOLE": 0, "PINHOLE": 1, "OPENCV": 4}
        for cam_id, cam in cams.items():
            f.write(
                struct.pack(
                    "<iiQQ", cam_id, model_ids[cam.model], cam.width, cam.height
                )
            )
            f.write(struct.pack(f"<{len(cam.params)}d", *cam.params))


def _write_images_bin(path, images):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for img_id, (name, cam_id, qvec, tvec) in images.items():
            f.write(struct.pack("<I", img_id))
            f.write(struct.pack("<4d", *qvec))
            f.write(struct.pack("<3d", *tvec))
            f.write(struct.pack("<I", cam_id))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # two 2D points
            f.write(struct.pack("<24s", b"\x00" * 24))
            f.write(struct.pack("<24s", b"\x00" * 24))


def test_colmap_bin_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        cams = {
            1: Camera("PINHOLE", 800, 600, np.array([500.0, 510.0, 400.0, 300.0]))
        }
        imgs = {
            1: ("a.png", 1, np.array([1.0, 0, 0, 0]), np.array([0.0, 0, 1])),
            2: (
                "b.png",
                1,
                np.array([0.9238795, 0, 0.3826834, 0]),
                np.array([1.0, 2, 3]),
            ),
        }
        _write_cameras_bin(os.path.join(d, "cameras.bin"), cams)
        _write_images_bin(os.path.join(d, "images.bin"), imgs)

        rcams, rimgs = load_sparse(d)
        assert rcams[1].model == "PINHOLE"
        np.testing.assert_allclose(rcams[1].K[0, 0], 500.0)
        np.testing.assert_allclose(rcams[1].K[1, 2], 300.0)
        assert rimgs[1].name == "a.png"
        np.testing.assert_allclose(rimgs[2].tvec, [1, 2, 3])
        # identity quaternion -> identity rotation
        np.testing.assert_allclose(rimgs[1].R(), np.eye(3), atol=1e-12)
        # unit quaternion -> orthonormal rotation
        R = rimgs[2].R()
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-7)


def test_similarity_from_cameras_normalizes():
    rng = np.random.default_rng(0)
    # cameras on a ring looking inward, y-down OpenCV convention
    n = 12
    c2ws = []
    for i in range(n):
        a = 2 * np.pi * i / n
        pos = np.array([3 * np.cos(a), -0.5, 3 * np.sin(a)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0, -1.0, 0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up2, fwd, pos
        c2ws.append(m)
    c2w = np.stack(c2ws)
    T, scale = similarity_from_cameras(c2w)
    out = np.einsum("nij, ki -> nkj", c2w, T)
    out[:, :3, 3] *= scale
    # recentered near origin and scaled to ~unit camera distance
    assert np.linalg.norm(np.median(out[:, :3, 3], axis=0)) < 0.5
    assert abs(np.median(np.linalg.norm(out[:, :3, 3], axis=-1)) - 1.0) < 0.2


def test_procedural_loaders_shapes():
    from nerfacc_tpu.datasets.procedural import make_loaders

    train, test = make_loaders(num_rays=64, width=32, height=32, n_train=2, n_test=1)
    b = train[0]
    assert b["rays"].origins.shape == (64, 3)
    assert b["pixels"].shape == (64, 3)
    bt = test[0]
    assert bt["rays"].origins.shape == (32, 32, 3)
    assert bt["pixels"].shape == (32, 32, 3)


def test_dynamic_procedural_loaders():
    from nerfacc_tpu.datasets.procedural import make_dynamic_loaders

    train, test = make_dynamic_loaders(
        num_rays=32, width=24, height=24, n_train=3, n_test=1
    )
    b = train[0]
    assert b["timestamps"].shape == (32, 1)
    assert float(b["timestamps"].min()) >= 0.0
    assert float(b["timestamps"].max()) <= 1.0
    bt = test[0]
    assert bt["timestamps"].shape == (24, 24, 1)


def test_subject_loader_disk_fixture(tmp_path, monkeypatch):
    """The disk path of SubjectLoader (transforms_*.json + PNGs — the
    real-data conformance protocol, reference ngp.rst:17-48) parses the
    committed tiny fixture, and bench.py's _quality_data auto-switches to
    it when NERFACC_DATA_ROOT is set (VERDICT r4 #7)."""
    import os

    from nerfacc_tpu.datasets.nerf_synthetic import SubjectLoader

    root = os.path.join(
        os.path.dirname(__file__), "fixtures", "nerf_synthetic_tiny"
    )
    train = SubjectLoader(
        subject_id="lego", root_fp=root, split="train", num_rays=64,
        color_bkgd_aug="random",
    )
    assert len(train) == 2 and train.WIDTH == 16 and train.HEIGHT == 16
    batch = train[0]
    assert batch["rays"].origins.shape == (64, 3)
    assert batch["pixels"].shape == (64, 3)
    # Ray directions are unit-norm and originate at the camera centers.
    d = np.asarray(batch["rays"].viewdirs)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    o = np.asarray(batch["rays"].origins)
    cams = train.camtoworlds[:, :3, 3]
    dist = np.linalg.norm(o[:, None] - cams[None], axis=-1).min(axis=1)
    np.testing.assert_allclose(dist, 0.0, atol=1e-5)

    test = SubjectLoader(subject_id="lego", root_fp=root, split="test")
    full = test[0]
    assert full["pixels"].shape == (16, 16, 3)

    # bench.py auto-switch: with NERFACC_DATA_ROOT set, the quality phase
    # loads the real subject (tag, aabb, occ-res flip to the reference
    # protocol); without it, the procedural proxy.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setenv("NERFACC_DATA_ROOT", root)
    monkeypatch.setenv("BENCH_Q_RAYS", "64")
    tr, te, tag, aabb_half, occ_res = bench._quality_data()
    assert tag == "lego" and aabb_half == 1.5 and occ_res == 128
    assert tr[0]["rays"].origins.shape == (64, 3)
