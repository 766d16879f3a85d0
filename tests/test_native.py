"""Native runtime tests: kd-tree vs scipy, .grf round-trip + prefetch reader."""

import numpy as np
import pytest

pytest.importorskip("scipy")

try:
    from gorio_tpu.io import native as gn

    gn.load()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")


def test_kdtree_matches_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    q = rng.normal(size=(500, 3)).astype(np.float32)
    tree = gn.NativeKDTree(pts)
    idx, d2 = tree.knn(q, 5)
    ref_d, ref_i = cKDTree(pts).query(q, k=5)
    np.testing.assert_allclose(np.sqrt(d2), ref_d, rtol=1e-5, atol=1e-6)
    # indices may differ on exact ties; distances must match
    np.testing.assert_allclose(
        np.linalg.norm(pts[idx] - q[:, None, :], axis=-1), ref_d, rtol=1e-5, atol=1e-6
    )


def test_grf_roundtrip_and_dataset(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    truth = []
    for i in range(5):
        xyz = rng.normal(size=(100 + i, 3)).astype(np.float32)
        inten = rng.random(100 + i).astype(np.float32)
        dop = rng.normal(size=100 + i).astype(np.float32)
        p = tmp_path / f"{i:04d}.grf"
        gn.write_frame(p, 10.0 + i, xyz, inten, dop)
        paths.append(p)
        truth.append((10.0 + i, xyz, inten, dop))
    ds = gn.NativeDataset(paths, capacity=256)
    frames = list(ds)
    assert len(frames) == 5
    for (stamp, xyz, inten, dop), (ts, tx, ti, td) in zip(frames, truth):
        assert stamp == ts
        np.testing.assert_allclose(xyz, tx)
        np.testing.assert_allclose(inten, ti)
        np.testing.assert_allclose(dop, td)


def test_dataset_capacity_clips(tmp_path):
    xyz = np.zeros((50, 3), np.float32)
    p = tmp_path / "a.grf"
    gn.write_frame(p, 1.0, xyz)
    ds = gn.NativeDataset([p], capacity=32)
    stamp, out_xyz, _, _ = next(iter(ds))
    assert out_xyz.shape == (32, 3)


def test_pcd_roundtrip(tmp_path):
    from gorio_tpu.io.pcd import read_pcd, write_pcd

    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    inten = rng.random(100).astype(np.float32)
    for binary in (True, False):
        p = tmp_path / f"c_{binary}.pcd"
        write_pcd(p, xyz, inten, binary=binary)
        x2, i2 = read_pcd(p)
        np.testing.assert_allclose(x2, xyz, atol=1e-5)
        np.testing.assert_allclose(i2, inten, atol=1e-5)
