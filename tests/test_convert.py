"""Dataset conversion round trip: CSV/NPZ/NPY -> .grf -> NativeDataset."""

import numpy as np
import pytest

from gorio_tpu.io.convert import convert_sequence

native = pytest.importorskip("gorio_tpu.io.native")


@pytest.fixture(scope="module")
def native_ok():
    try:
        native.load()
    except native.NativeUnavailable as e:
        pytest.skip(f"native runtime unavailable: {e}")


def test_convert_roundtrip(tmp_path, native_ok):
    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    raw.mkdir()

    # frame 0: CSV with aliased column names and an extra column
    xyz0 = rng.normal(size=(50, 3))
    inten0 = rng.uniform(0, 40, 50)
    dop0 = rng.normal(size=50)
    with open(raw / "100.50.csv", "w") as f:
        f.write("x,y,z,power,radial_speed,range\n")
        for p, i_, d in zip(xyz0, inten0, dop0):
            f.write(f"{p[0]},{p[1]},{p[2]},{i_},{d},{np.linalg.norm(p)}\n")

    # frame 1: NPZ
    xyz1 = rng.normal(size=(30, 3))
    np.savez(raw / "100.60.npz", xyz=xyz1, intensity=np.ones(30), doppler=np.zeros(30))

    # frame 2: bare NPY, xyz only
    xyz2 = rng.normal(size=(20, 3))
    np.save(raw / "100.70.npy", xyz2)

    imu_csv = tmp_path / "imu.csv"
    with open(imu_csv, "w") as f:
        f.write("t,wx,wy,wz\n")
        for t in np.linspace(100.0, 101.0, 11):
            f.write(f"{t},0.01,0.02,-0.01\n")

    out = tmp_path / "seq"
    n = convert_sequence(
        sorted(raw.iterdir()), out, imu_csv=imu_csv, rate=10.0
    )
    assert n == 3
    imu = np.load(out / "imu.npz")
    assert imu["gyr"].shape == (11, 3)
    assert imu["vel_t"].size == 0  # no ego-velocity columns -> online twists

    frames = sorted(out.glob("*.grf"))
    assert len(frames) == 3
    ds = native.NativeDataset(frames, capacity=128)
    items = list(ds)
    assert [round(s, 2) for s, *_ in items] == [100.50, 100.60, 100.70]
    s0, x0, i0, d0 = items[0]
    np.testing.assert_allclose(x0, xyz0.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(i0, inten0.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(d0, dop0.astype(np.float32), rtol=1e-6)
    _, x2, i2, _ = items[2]
    np.testing.assert_allclose(x2, xyz2.astype(np.float32), rtol=1e-6)
    assert np.all(i2 == 0)


def test_convert_range_gate(tmp_path, native_ok):
    xyz = np.array([[0.5, 0, 0], [5.0, 0, 0], [500.0, 0, 0]])
    np.save(tmp_path / "0.npy", xyz)
    out = tmp_path / "seq"
    convert_sequence([tmp_path / "0.npy"], out, min_range=1.0, max_range=100.0)
    ds = native.NativeDataset(sorted(out.glob("*.grf")), capacity=16)
    _, x, _, _ = next(iter(ds))
    assert x.shape[0] == 1 and abs(x[0, 0] - 5.0) < 1e-6
