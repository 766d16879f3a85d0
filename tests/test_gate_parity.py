"""Gate-chain parity tests (VERDICT r1 item 3): barometer loop gate, GPS edge
gate chain, ScanMatchingStatus.inlier_fraction, and the external-pose (MSF)
hook in the odometry motion guess. Each mirrors a specific reference site and
flips behavior through config/inputs."""

import jax.numpy as jnp
import numpy as np

from gorio_tpu.core.pointcloud import make_cloud
from gorio_tpu.loopclosure.loop_detector import LoopConfig, candidate_gates_np
from gorio_tpu.pipeline.keyframes import KeyFrame
from gorio_tpu.pipeline.odometry import (
    OdometryConfig,
    ScanMatchingOdometry,
    _inlier_fraction,
)
from gorio_tpu.pipeline.slam import RadarGraphSLAM, SLAMConfig


def _gate_args(**over):
    """A candidate pair that passes every gate by default."""
    args = dict(
        new_pos=np.array([1.0, 0.0, 0.0]),
        new_yaw=0.0,
        new_accum=100.0,
        old_pos=np.array([0.0, 0.0, 0.0]),
        old_yaw=0.1,
        old_accum=10.0,
        dist_since_last_loop=50.0,
        cfg=LoopConfig(),
    )
    args.update(over)
    return args


# ---- barometer/altitude candidate gate (`loop_detector.cpp:155-157`) --------


def test_baro_gate_rejects_large_altitude_difference():
    assert candidate_gates_np(**_gate_args())
    cfg = LoopConfig(max_baro_difference=2.0)
    assert not candidate_gates_np(**_gate_args(cfg=cfg, new_alt=10.0, old_alt=0.0))
    assert candidate_gates_np(**_gate_args(cfg=cfg, new_alt=1.0, old_alt=0.0))
    # gate only fires when the old keyframe carries an altitude (`:156`)
    assert candidate_gates_np(**_gate_args(cfg=cfg, new_alt=10.0, old_alt=None))
    # threshold is configurable
    wide = LoopConfig(max_baro_difference=50.0)
    assert candidate_gates_np(**_gate_args(cfg=wide, new_alt=10.0, old_alt=0.0))


def test_keyframe_altitude_roundtrip(tmp_path):
    cloud = make_cloud(np.random.default_rng(0).normal(size=(32, 3)))
    kf = KeyFrame(
        index=3, stamp=1.5, odom_scan2scan=np.eye(4), accum_distance=2.0,
        cloud=cloud, altitude=12.25,
    )
    kf.save(str(tmp_path / "kf"))
    kf2 = KeyFrame.load(str(tmp_path / "kf"))
    assert kf2.altitude == 12.25


# ---- GPS edge gate chain (`radar_graph_slam_nodelet.cpp:1248-1327`) ---------


def _slam_with_chain(n=25, spacing=1.0, **cfg_over):
    cfg = SLAMConfig(
        enable_preintegration=False, enable_loop_closure=False, **cfg_over
    )
    slam = RadarGraphSLAM(cfg)
    cloud = make_cloud(np.random.default_rng(1).normal(size=(64, 3)))
    for k in range(n):
        T = np.eye(4)
        T[0, 3] = k * spacing
        slam.keyframes.append(
            KeyFrame(index=k, stamp=float(k), odom_scan2scan=T,
                     accum_distance=k * spacing, cloud=cloud)
        )
    return slam


def _est(kf):
    return kf.optimized_pose if kf.optimized_pose is not None else kf.odom_scan2scan


def test_gps_residual_gate_skips_small_drift():
    """`:1303-1304`: edges only activate once the estimate drifts > 5 m."""
    slam = _slam_with_chain()
    # fix agrees with the estimate -> utm_coord set, but no edge
    slam.push_gps(10.0, np.array([10.0, 0.0, 0.0]))
    slam._flush_gps_queue(_est)
    kf = slam.keyframes[10]
    assert kf.utm_coord is not None
    assert not kf._gps_edge

    # a drifted fix (>5 m off) on a later keyframe activates the edge
    slam.push_gps(21.0, np.array([21.0, 8.0, 0.0]))
    slam._flush_gps_queue(_est)
    kf2 = slam.keyframes[21]
    assert kf2.utm_coord is not None and kf2._gps_edge


def test_gps_covariance_gate():
    """`:1293`: raw covariance entries above the stddev params are rejected."""
    slam = _slam_with_chain(max_gps_edge_stddev_xy=1.0, max_gps_edge_stddev_z=2.0)
    slam.push_gps(10.0, np.array([10.0, 50.0, 0.0]), cov=np.array([5.0, 0.5, 0.5]))
    slam._flush_gps_queue(_est)
    assert slam.keyframes[10].utm_coord is None  # rejected before association

    slam.push_gps(12.0, np.array([12.0, 50.0, 0.0]), cov=np.array([0.5, 0.5, 0.5]))
    slam._flush_gps_queue(_est)
    kf = slam.keyframes[12]
    assert kf.utm_coord is not None and kf._gps_edge
    # information from the per-fix covariance (`information_matrix(i,i) /= cov`)
    np.testing.assert_allclose(kf._gps_info, 2.0)


def test_gps_edge_interval_and_time_gates():
    slam = _slam_with_chain(gps_edge_intervals=10)
    for k in (5, 6, 7, 15, 16):
        slam.push_gps(float(k), np.array([float(k), 30.0, 0.0]))
    # a fix far from any keyframe stamp is never associated (`0.2 <` gate)
    slam.push_gps(3.5, np.array([100.0, 100.0, 0.0]))
    slam._flush_gps_queue(_est)
    with_edges = [kf.index for kf in slam.keyframes if getattr(kf, "_gps_edge", False)]
    assert len(with_edges) >= 1
    # consecutive edges respect the index spacing (`:1259`)
    assert all(b - a >= 10 for a, b in zip(with_edges, with_edges[1:]))


def test_gps_edges_pull_optimized_trajectory():
    """End-to-end: gated GPS edges enter the graph and pull the solution."""
    slam = _slam_with_chain(n=16, gps_edge_intervals=4, gps_residual_skip_dist=5.0)
    # drifted odometry: GPS says the true track bends +y
    for k in range(0, 16, 2):
        slam.push_gps(float(k), np.array([float(k), 10.0, 0.0]))
    opt = slam.optimize()
    assert opt is not None
    y_end = opt[-1][1, 3]
    assert y_end > 1.0, f"GPS edges had no effect: y_end={y_end}"


# ---- ScanMatchingStatus.inlier_fraction (`:677-689`) ------------------------


def test_inlier_fraction_values():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(128, 3)) * 5
    a = make_cloud(pts)
    b = make_cloud(pts + 0.01)
    frac = float(
        _inlier_fraction(a.xyz, a.mask, b.xyz, b.mask, jnp.eye(4, dtype=a.xyz.dtype),
                         jnp.asarray(0.5, a.xyz.dtype))
    )
    assert frac > 0.99
    c = make_cloud(pts + 100.0)
    frac0 = float(
        _inlier_fraction(a.xyz, a.mask, c.xyz, c.mask, jnp.eye(4, dtype=a.xyz.dtype),
                         jnp.asarray(0.5, a.xyz.dtype))
    )
    assert frac0 < 0.01
    # the transform is applied to the source before the NN check
    T = np.eye(4)
    T[:3, 3] = 100.0
    frac1 = float(
        _inlier_fraction(a.xyz, a.mask, c.xyz, c.mask, jnp.asarray(T, a.xyz.dtype),
                         jnp.asarray(0.5, a.xyz.dtype))
    )
    assert frac1 > 0.99


def test_status_carries_inlier_fraction():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-10, 10, size=(256, 3))
    odo = ScanMatchingOdometry(OdometryConfig())
    odo.step(0.0, make_cloud(pts), np.zeros(3))
    odo.step(0.1, make_cloud(pts + [0.05, 0.0, 0.0]), np.array([0.5, 0.0, 0.0]))
    st = odo.statuses[-1]
    assert 0.0 <= st.inlier_fraction <= 1.0
    assert st.inlier_fraction > 0.9  # nearly identical scans

    odo2 = ScanMatchingOdometry(OdometryConfig(compute_inlier_fraction=False))
    odo2.step(0.0, make_cloud(pts), np.zeros(3))
    odo2.step(0.1, make_cloud(pts), np.zeros(3))
    assert np.isnan(odo2.statuses[-1].inlier_fraction)


# ---- external-pose (MSF) hook (`:83-84`, `:450-462`) ------------------------


def test_msf_delta_requires_enable_and_fresh_stamps():
    odo = ScanMatchingOdometry(OdometryConfig())  # hook disabled by default
    T = np.eye(4)
    T[0, 3] = 2.0
    odo.push_msf_pose(1.0, np.eye(4), after_update=True)
    odo.push_msf_pose(1.1, T, after_update=False)
    d, label = odo._msf_delta()
    np.testing.assert_allclose(d, np.eye(4))
    assert label == ""

    odo2 = ScanMatchingOdometry(OdometryConfig(enable_imu_frontend=True))
    odo2.push_msf_pose(1.0, np.eye(4), after_update=True)
    odo2.push_msf_pose(1.1, T, after_update=False)
    d2, label2 = odo2._msf_delta()
    np.testing.assert_allclose(d2, T)  # after_update^-1 @ pose
    assert label2 == "imu"

    # stale poses (predating the keyframe) are ignored
    odo2.keyframe_stamp = 5.0
    d3, label3 = odo2._msf_delta()
    np.testing.assert_allclose(d3, np.eye(4))
    assert label3 == ""


def test_msf_delta_feeds_guess_and_status_label():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-10, 10, size=(256, 3))
    odo = ScanMatchingOdometry(OdometryConfig(enable_imu_frontend=True))
    odo.step(0.0, make_cloud(pts), np.zeros(3))
    T = np.eye(4)
    T[0, 3] = 0.05
    odo.push_msf_pose(0.05, np.eye(4), after_update=True)
    odo.push_msf_pose(0.06, T, after_update=False)
    odo.step(0.1, make_cloud(pts + [0.05, 0.0, 0.0]), np.zeros(3))
    assert odo.statuses[-1].prediction_label == "imu"


# ---- pairwise consistency cycle convention (`loop_detector.cpp:270-297`) ----


def test_pairwise_consistency_accepts_consistent_loops():
    """Drift-free odometry + exact loop transforms must close the cycle
    i -> j (current loop) -> l (odom) -> k (previous loop) -> i (odom):
    the r2 implementation swapped the previous loop's endpoints and rejected
    every consistent second loop (45 rejections on the 2-lap circuit)."""
    from gorio_tpu.loopclosure.loop_detector import pairwise_consistency_check

    rng = np.random.default_rng(4)
    # ground-truth poses for keyframes l, k, j, i (prev old/new, cur old/new)
    def pose(t, yaw):
        T = np.eye(4)
        c, s = np.cos(yaw), np.sin(yaw)
        T[:2, :2] = [[c, -s], [s, c]]
        T[:3, 3] = t
        return T

    X = {
        "l": pose([0.0, 0.0, 0.0], 0.1),
        "k": pose([0.4, 0.2, 0.0], 0.15),
        "j": pose([5.0, 1.0, 0.0], 0.9),
        "i": pose([5.3, 1.2, 0.0], 1.0),
    }
    inv = np.linalg.inv
    # loop transforms in the detector's convention: T_rel = old_T_new
    T_rel_prev = inv(X["l"]) @ X["k"]
    T_rel_cur = inv(X["j"]) @ X["i"]
    # odometry = truth (drift-free)
    odom_li = inv(X["j"]) @ X["l"]
    odom_jk = inv(X["k"]) @ X["i"]
    cfg = LoopConfig()
    assert pairwise_consistency_check(
        inv(T_rel_cur), odom_li, T_rel_prev, odom_jk, cfg
    )
    # a corrupted current loop breaks the cycle
    bad = T_rel_cur.copy()
    bad[:3, 3] += [5.0, 0, 0]
    assert not pairwise_consistency_check(inv(bad), odom_li, T_rel_prev, odom_jk, cfg)


def test_imu_fallback_delta_spans_one_frame():
    """The IMU fallback rotation must span prev_frame -> this frame, not the
    whole accepted stretch since the last rejection (advisor r3: the
    reference refreshes last_frame_imu EVERY frame,
    scan_matching_odometry_nodelet.cpp:531)."""
    from gorio_tpu.pipeline.odometry import ScanMatchingOdometry, _rpy_to_mat

    odo = ScanMatchingOdometry()
    # roll ramps 0.01 rad per 0.1 s over 5 s of IMU samples
    for k in range(50):
        t = k * 0.1
        roll = 0.01 * k
        R = _rpy_to_mat(roll, 0.0, 0.0)
        w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
        q = [w, (R[2, 1] - R[1, 2]) / (4 * w), (R[0, 2] - R[2, 0]) / (4 * w),
             (R[1, 0] - R[0, 1]) / (4 * w)]
        odo.push_imu(t, q)
    # frames at 10 Hz; previous frame at t=4.8, rejection at t=4.9
    odo._prev_frame_stamp = 4.8
    fb = odo._imu_fallback_delta(4.9, np.array([0.5, 0.0, 0.0]))
    assert fb is not None
    roll_fb = np.arctan2(fb[2, 1], fb[2, 2])
    # one-frame delta is 0.01 rad — an accumulated-stretch bug would give ~0.48
    assert abs(roll_fb - 0.01) < 2e-3, roll_fb
    np.testing.assert_allclose(fb[:3, 3], [0.5, 0.0, 0.0])
    # without a previous frame stamp there is no defined delta
    odo2 = ScanMatchingOdometry()
    for k in range(5):
        odo2.push_imu(k * 0.1, [1.0, 0, 0, 0])
    assert odo2._imu_fallback_delta(0.4, np.zeros(3)) is None
