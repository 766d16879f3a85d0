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


def test_empty_frame_does_not_truncate_sequence(tmp_path):
    """A valid frame with zero returns (total sensor dropout) must not be
    mistaken for end-of-sequence: both readers skip it and continue. This bit
    the accuracy benchmark — one empty FOV-limited scan silently cut a 198-
    frame sequence to 57."""
    rng = np.random.default_rng(2)
    paths = []
    for i, n in enumerate([40, 0, 30, 0, 20]):
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        p = tmp_path / f"{i:04d}.grf"
        gn.write_frame(p, 1.0 + i, xyz, np.ones(n, np.float32), np.zeros(n, np.float32))
        paths.append(p)
    frames = list(gn.NativeDataset(paths, capacity=64))
    assert [f[1].shape[0] for f in frames] == [40, 30, 20]
    assert [f[0] for f in frames] == [1.0, 3.0, 5.0]
    pframes = [(s, n) for s, n, _ in gn.NativePipelineDataset(paths, capacity=64)]
    assert [n for _, n in pframes] == [40, 30, 20]
    assert [s for s, _ in pframes] == [1.0, 3.0, 5.0]


def test_dataset_capacity_clips(tmp_path):
    xyz = np.zeros((50, 3), np.float32)
    p = tmp_path / "a.grf"
    gn.write_frame(p, 1.0, xyz)
    ds = gn.NativeDataset([p], capacity=32)
    stamp, out_xyz, _, _ = next(iter(ds))
    assert out_xyz.shape == (32, 3)


def test_pipeline_dataset_matches_plain_reader(tmp_path):
    """The 2-stage (decode -> pack) native pipeline must yield the same
    frames as NativeDataset, already zero-padded to (capacity, FIELDS) —
    this is the runtime path `cli.py slam` ingests through."""
    rng = np.random.default_rng(7)
    paths = []
    for i in range(8):
        n = 64 + 16 * i
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        inten = rng.random(n).astype(np.float32)
        dop = rng.normal(size=n).astype(np.float32)
        p = tmp_path / f"{i:04d}.grf"
        gn.write_frame(p, 5.0 + 0.1 * i, xyz, inten, dop)
        paths.append(p)
    cap = 256
    plain = list(gn.NativeDataset(paths, capacity=cap))
    pipe = gn.NativePipelineDataset(paths, capacity=cap, queue_depth=3)
    got = [(stamp, n, padded.copy()) for stamp, n, padded in pipe]
    assert len(got) == len(plain) == 8
    for (ps, px, pi, pd), (stamp, n, padded) in zip(plain, got):
        assert stamp == ps and n == len(px)
        np.testing.assert_allclose(padded[:n, :3], px)
        np.testing.assert_allclose(padded[:n, 3], pi)
        np.testing.assert_allclose(padded[:n, 4], pd)
        # pack stage zero-pads the tail
        assert np.all(padded[n:] == 0.0)


def test_pipeline_dataset_clips_and_prefetches(tmp_path):
    xyz = np.ones((50, 3), np.float32)
    paths = []
    for i in range(6):
        p = tmp_path / f"{i}.grf"
        gn.write_frame(p, float(i), xyz)
        paths.append(p)
    ds = gn.NativePipelineDataset(paths, capacity=32, queue_depth=4)
    import time

    time.sleep(0.2)  # the decode/pack threads run ahead of the consumer
    assert ds.backlog(2) > 0  # packed frames waiting in the output queue
    stamp, n, padded = next(iter(ds))
    assert n == 32 and padded.shape == (32, 5)
    ds.close()


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
