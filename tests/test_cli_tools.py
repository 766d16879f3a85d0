"""CLI utility-tool tests: gt-adjust (graph-based GT trajectory adjustment,
parity with /root/reference/4DRadarSLAM/src/gt_adjust.cpp) and utm-align
(UTM->world transform via single-vertex graph solve, parity with
src/gps_traj_align.cpp)."""

import json

import numpy as np
import pytest

from gorio_tpu.cli import main
from gorio_tpu.core import lie as _lie  # noqa: F401  (jax warm import)
from gorio_tpu.io.tum import load_tum, save_tum


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _drifty_circuit(n=60, drift=0.004):
    """A closed circuit whose odometry accumulates per-step drift, so the
    final pose misses the start — gt_adjust.cpp's use case (its Loop2/Loop3
    GT files end where they start)."""
    poses = [np.eye(4)]
    step = np.eye(4)
    step[:3, :3] = _rotz(2 * np.pi / (n - 1))
    step[0, 3] = 1.0
    bad = step.copy()
    bad[1, 3] += drift  # lateral drift per step
    bad[0, 3] += drift
    for _ in range(n - 1):
        poses.append(poses[-1] @ bad)
    return np.stack(poses)


def test_gt_adjust_closes_loop(tmp_path, capsys):
    poses = _drifty_circuit()
    n = len(poses)
    stamps = np.arange(n, dtype=np.float64) * 0.1
    src = tmp_path / "gt_raw.tum"
    dst = tmp_path / "gt_adj.tum"
    save_tum(src, stamps, poses)
    gap_before = np.linalg.norm(poses[-1][:3, 3] - poses[0][:3, 3])
    main(
        [
            "gt-adjust",
            str(src),
            str(dst),
            "--loop",
            f"0:{n - 1}",
            "--iters",
            "48",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_loops"] == 1 and out["n_poses"] == n
    s2, adj = load_tum(dst)
    assert len(s2) == n
    gap_after = np.linalg.norm(adj[-1][:3, 3] - adj[0][:3, 3])
    # the identity loop edge pulls the endpoints together; interior stays smooth
    assert gap_after < 0.25 * gap_before, (gap_before, gap_after)
    steps = np.linalg.norm(np.diff(adj[:, :3, 3], axis=0), axis=1)
    assert steps.max() < 1.5  # no tearing


def test_gt_adjust_rejects_bad_loop_index(tmp_path):
    poses = _drifty_circuit(10)
    src = tmp_path / "t.tum"
    save_tum(src, np.arange(10.0), poses)
    with pytest.raises(SystemExit):
        main(["gt-adjust", str(src), str(tmp_path / "o.tum"), "--loop", "0:99"])


def test_utm_align_recovers_transform(tmp_path, capsys):
    rng = np.random.default_rng(3)
    # world trajectory
    n = 40
    stamps = np.arange(n, dtype=np.float64) * 0.5
    poses = np.tile(np.eye(4), (n, 1, 1))
    t = np.linspace(0, 4 * np.pi, n)
    poses[:, 0, 3] = 30 * np.cos(t / 4)
    poses[:, 1, 3] = 20 * np.sin(t / 4)
    poses[:, 2, 3] = 0.5 * np.sin(t)
    traj = tmp_path / "traj.tum"
    save_tum(traj, stamps, poses)
    # known UTM->world transform; fixes = T_utm_world * p_world + noise
    T_true = np.eye(4)
    T_true[:3, :3] = _rotz(0.7)
    T_true[:3, 3] = [385000.0, 5820000.0, 30.0]
    T_inv = np.linalg.inv(T_true)
    p_utm = (T_inv[:3, :3] @ poses[:, :3, 3].T).T + T_inv[:3, 3]
    p_utm += rng.normal(scale=0.05, size=p_utm.shape)
    gps = tmp_path / "gps.txt"
    with open(gps, "w") as f:
        f.write("# stamp east north alt var_x var_y var_z\n")
        for k in range(n):
            # one fix fails the covariance gate (var_x > 3) — must be dropped
            var = (9.0, 9.0, 9.0) if k == 5 else (0.01, 0.01, 0.02)
            f.write(
                f"{stamps[k]:.3f} {p_utm[k, 0]:.4f} {p_utm[k, 1]:.4f} "
                f"{p_utm[k, 2]:.4f} {var[0]} {var[1]} {var[2]}\n"
            )
    out_t = tmp_path / "T.txt"
    main(["utm-align", str(traj), str(gps), "--output", str(out_t), "--iters", "96"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_pairs"] == n - 1  # the gated fix dropped
    T_est = np.asarray(out["T_world_utm"])
    # rotation within ~0.5 deg of the planted transform
    dR = T_est[:3, :3].T @ T_true[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang
    # absolute translation is ill-conditioned by design (a ~4e6 m UTM lever
    # arm amplifies the rotation's noise floor into km of translation — true
    # for the reference solve too); the meaningful check is that T maps the
    # fixes onto the trajectory at the observation noise level
    mapped = (T_est[:3, :3] @ p_utm.T).T + T_est[:3, 3]
    resid = np.linalg.norm(mapped - poses[:, :3, 3], axis=1)
    resid = np.delete(resid, 5)  # the gated fix
    assert np.sqrt(np.mean(resid**2)) < 0.15, resid.max()
    np.testing.assert_allclose(np.loadtxt(out_t), T_est, atol=1e-9)
