"""Scan Context + loop detection tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gorio_tpu.core.pointcloud import make_cloud
from gorio_tpu.io.synthetic import make_world, render_radar_scan
from gorio_tpu.loopclosure.information import InformationConfig, calc_information_matrix
from gorio_tpu.loopclosure.scancontext import (
    ScanContextConfig,
    ScanContextDB,
    detect_loop,
    make_scancontext,
    ring_key,
    sc_distance,
)


def _scan(seed, pos, yaw=0.0, capacity=1024):
    from scipy.spatial.transform import Rotation

    world = make_world(seed=40, n_landmarks=5000)
    R = Rotation.from_euler("z", yaw).as_matrix()
    return render_radar_scan(world, R, np.asarray(pos), np.zeros(3), capacity=capacity, seed=seed)


def test_descriptor_shape_and_content():
    cloud = _scan(0, [0.0, 0.0, 0.0])
    cfg = ScanContextConfig()
    desc = make_scancontext(cloud, cfg)
    assert desc.shape == (cfg.num_ring, cfg.num_sector)
    assert float(jnp.max(desc)) > 0
    assert float(jnp.min(desc)) >= 0


def test_same_place_low_distance_distinct_place_high():
    d0 = make_scancontext(_scan(1, [0.0, 0.0, 0.0]))
    d0b = make_scancontext(_scan(2, [0.3, 0.1, 0.0]))  # revisit, small offset
    d_far = make_scancontext(_scan(3, [45.0, 30.0, 0.0]))
    near, _ = sc_distance(d0, d0b)
    far, _ = sc_distance(d0, d_far)
    assert float(near) < 0.35
    assert float(far) > float(near) + 0.1


def test_yaw_shift_detected():
    cfg = ScanContextConfig()
    d0 = make_scancontext(_scan(4, [0.0, 0.0, 0.0], yaw=0.0), cfg)
    d_rot = make_scancontext(_scan(5, [0.0, 0.0, 0.0], yaw=np.deg2rad(22.6)), cfg)
    dist, shift = sc_distance(d0, d_rot)
    # 22.6 deg = 4 sectors of 5.65 deg
    sector_angle = 2 * cfg.azimuth_max_deg / cfg.num_sector
    est = float(shift) if float(shift) <= cfg.num_sector // 2 else float(shift) - cfg.num_sector
    assert abs(abs(est) * sector_angle - 22.6) < 2 * sector_angle


def test_db_detects_revisit():
    cfg = ScanContextConfig(num_exclude_recent=2, dist_threshold=0.5)
    db = ScanContextDB.create(64, cfg, dtype=jnp.float64)
    positions = [[2.0 * k, 0.0, 0.0] for k in range(12)]
    for k, p in enumerate(positions):
        db = db.add(make_scancontext(_scan(10 + k, p), cfg))
    # revisit position of keyframe 1
    q = make_scancontext(_scan(99, [2.0, 0.05, 0.0]), cfg)
    match, yaw, dist = detect_loop(db, q, cfg)
    assert int(match) in (0, 1, 2, 3), (int(match), float(dist))
    assert float(dist) < 0.5


def test_no_match_in_new_area():
    cfg = ScanContextConfig(num_exclude_recent=2, dist_threshold=0.25)
    db = ScanContextDB.create(64, cfg, dtype=jnp.float64)
    for k in range(8):
        db = db.add(make_scancontext(_scan(20 + k, [2.0 * k, 0.0, 0.0]), cfg))
    q = make_scancontext(_scan(77, [10.0, 55.0, 0.0]), cfg)
    match, _, dist = detect_loop(db, q, cfg)
    assert int(match) == -1 or float(dist) >= 0.25


def test_information_matrix_monotone_in_fitness():
    cloud_a = _scan(30, [0.0, 0.0, 0.0])
    cloud_b = _scan(31, [0.5, 0.0, 0.0])
    T_good = np.eye(4)
    T_good[:3, 3] = [0.5, 0.0, 0.0]
    info_good, fit_good = calc_information_matrix(cloud_b, cloud_a, jnp.asarray(T_good))
    T_bad = np.eye(4)
    T_bad[:3, 3] = [3.0, 2.0, 0.0]
    info_bad, fit_bad = calc_information_matrix(cloud_b, cloud_a, jnp.asarray(T_bad))
    assert float(fit_good) < float(fit_bad)
    assert float(info_good[3, 3]) > float(info_bad[3, 3])
    assert float(info_good[0, 0]) > float(info_bad[0, 0])


def test_constant_information():
    cloud = _scan(32, [0.0, 0.0, 0.0])
    cfg = InformationConfig(use_const_inf_matrix=True, const_stddev_x=0.5, const_stddev_q=0.1)
    info, _ = calc_information_matrix(cloud, cloud, jnp.eye(4), cfg)
    np.testing.assert_allclose(np.asarray(info[3:, 3:]), np.eye(3) / 0.25, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(info[:3, :3]), np.eye(3) / 0.01, rtol=1e-9)


def test_sc_pair_image(tmp_path):
    """Descriptor image export (parity: SC pair publish on loop accept)."""
    import numpy as np

    from gorio_tpu.loopclosure.scancontext import save_pgm, sc_pair_image

    d1 = np.random.default_rng(0).random((40, 20))
    d2 = np.random.default_rng(1).random((40, 20))
    img = sc_pair_image(d1, d2, upscale=2)
    assert img.dtype == np.uint8
    assert img.shape == (40 * 2 * 2 + 2, 20 * 2)
    path = tmp_path / "pair.pgm"
    save_pgm(path, img)
    raw = path.read_bytes()
    assert raw.startswith(b"P5\n40 162\n255\n")
    assert len(raw) == len(b"P5\n40 162\n255\n") + img.size


def test_detect_batch_heterogeneous_capacities():
    """detect_batch must verify loop candidates whose keyframe clouds have
    DIFFERENT padded capacities (regression: jnp.stack over mixed-capacity
    PointClouds crashed; pairs are now grouped by capacity)."""
    import numpy as np
    from gorio_tpu.core.pointcloud import make_cloud
    from gorio_tpu.loopclosure.loop_detector import LoopConfig, LoopDetector

    rng = np.random.default_rng(12)
    pts = rng.uniform(-20, 20, size=(400, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.5, 2.0, size=400)
    inten = rng.uniform(1.0, 30.0, size=400).astype(np.float32)

    det = LoopDetector(
        cfg=LoopConfig(
            accum_distance_thresh=5.0, min_loop_interval_dist=0.0,
            enable_odom_check=False,
        )
    )
    K = 13
    clouds, poses, accums = [], [], []
    for k in range(K):
        far = k not in (0, K - 1)
        offset = np.array([500.0 + 40.0 * k, 0.0, 0.0]) if far else np.zeros(3)
        # revisit frame uses a different capacity than the original
        cap = 1024 if k < K - 1 else 2048
        noise = rng.normal(scale=0.01, size=pts.shape).astype(np.float32) if not far else 0.0
        xyz = (pts + offset + noise) if not far else rng.uniform(-20, 20, (400, 3)).astype(np.float32) + offset
        clouds.append(make_cloud(xyz, intensity=inten, capacity=cap))
        T = np.eye(4)
        T[:3, 3] = offset
        poses.append(T)
        accums.append(10.0 * k)
        det.add_keyframe(clouds[-1])
    loops = det.detect_batch(
        [K - 1], clouds, np.stack(poses), np.stack(poses), np.asarray(accums)
    )
    assert len(loops) == 1 and loops[0].key_old == 0
    # translation between the two revisit scans is near zero
    assert np.linalg.norm(loops[0].T_rel[:3, 3]) < 0.3


def test_db_grows_past_capacity():
    """Adding beyond the DB capacity must keep descriptors retrievable: the
    fixed-capacity `.at[i].set` silently DROPS out-of-bounds writes (XLA
    scatter semantics) while count grows — long trajectories would lose loop
    closure without `grow()` (exercised via LoopDetector.add_keyframe)."""
    from gorio_tpu.loopclosure.loop_detector import LoopDetector

    det = LoopDetector(capacity=4)
    clouds = [_scan(60 + k, [2.0 * k, 0.0, 0.0], capacity=256) for k in range(10)]
    for c in clouds:
        det.add_keyframe(c)
    assert int(det.db.count) == 10
    assert det.db.descs.shape[0] >= 10
    # descriptor 9 was actually stored (not dropped): it matches a re-render
    # of the same place
    q = make_scancontext(_scan(99, [18.0, 0.05, 0.0], capacity=256), det.sc_cfg)
    cfg2 = det.sc_cfg._replace(num_exclude_recent=0, dist_threshold=0.8)
    match, yaw, dist = detect_loop(det.db, q.astype(det.db.descs.dtype), cfg2)
    assert int(match) >= 7, (int(match), float(dist))
