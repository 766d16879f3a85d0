"""End-to-end loop closure: a square loop with drifting odometry must fire a
Scan-Context loop detection and pull the trajectory closed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end tier: `pytest -m slow`
from scipy.spatial.transform import Rotation

from gorio_tpu.io.synthetic import make_world, render_radar_scan
from gorio_tpu.io.tum import ate_rmse
from gorio_tpu.loopclosure.loop_detector import LoopConfig
from gorio_tpu.loopclosure.scancontext import ScanContextConfig
from gorio_tpu.pipeline.slam import RadarGraphSLAM, SLAMConfig


def _square_path(side=12.0, step=1.0):
    """Poses around a square, returning to the start."""
    poses = []
    yaw = 0.0
    p = np.zeros(3)
    for leg in range(4):
        for _ in range(int(side / step)):
            T = np.eye(4)
            T[:3, :3] = Rotation.from_euler("z", yaw).as_matrix()
            T[:3, 3] = p.copy()
            poses.append(T)
            p += T[:3, :3] @ np.array([step, 0, 0])
        yaw += np.pi / 2
    # revisit of the start area (closing segment)
    for _ in range(3):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_euler("z", yaw).as_matrix()
        T[:3, 3] = p.copy()
        poses.append(T)
        p += T[:3, :3] @ np.array([step, 0, 0])
    return poses


@pytest.mark.slow
def test_loop_closure_end_to_end():
    world = make_world(seed=60, n_landmarks=9000, extent=35.0)
    truth = _square_path()
    rng = np.random.default_rng(0)

    # odometry with systematic drift (yaw bias) — classic loop-closure setup
    cfg = SLAMConfig(
        enable_preintegration=False,
        enable_loop_closure=True,
        loop=LoopConfig(
            accum_distance_thresh=20.0,
            min_loop_interval_dist=10.0,
            odom_check_trans_thresh=1.0,
            odom_check_rot_thresh=0.3,
        ),
    )
    slam = RadarGraphSLAM(cfg)
    drift = np.eye(4)
    drift[:3, :3] = Rotation.from_euler("z", 0.004).as_matrix()  # per-step yaw bias
    odom = [truth[0]]
    for k in range(1, len(truth)):
        rel = np.linalg.inv(truth[k - 1]) @ truth[k]
        odom.append(odom[-1] @ rel @ drift)

    scans = []
    for k, T in enumerate(truth):
        scans.append(
            render_radar_scan(
                world, T[:3, :3], T[:3, 3], np.array([4.0, 0, 0]),
                capacity=1536, seed=500 + k, dropout=0.2, max_range=35.0,
            )
        )

    for k, (T_o, cloud) in enumerate(zip(odom, scans)):
        slam.add_frame(float(k) * 0.25, cloud, T_o)
        if k and k % 10 == 0:
            slam.optimize()
    slam.optimize()

    stamps = np.arange(len(truth)) * 0.25
    gt = np.stack(truth)
    ate_odom = ate_rmse(stamps, np.stack(odom), stamps, gt)
    kf_stamps, kf_poses = slam.trajectory()
    ate_opt = ate_rmse(kf_stamps, kf_poses, stamps, gt)

    assert len(slam.loops) >= 1, "no loop closure detected"
    assert ate_opt < ate_odom * 0.7, (ate_opt, ate_odom)
    assert ate_opt < 0.6, ate_opt
