"""Floor-constraint path of the SLAM backend: keyframe ground-plane
observations tied to one world floor VertexPlane (EdgeSE3Plane), correcting
z-drift the odometry factors cannot observe."""

import jax.numpy as jnp
import numpy as np

from gorio_tpu.core.pointcloud import make_cloud
from gorio_tpu.graph.factors import transform_plane
from gorio_tpu.pipeline.slam import RadarGraphSLAM, SLAMConfig

RNG = np.random.default_rng(3)


def _dummy_cloud():
    return make_cloud(jnp.asarray(RNG.normal(size=(32, 3)) * 5.0), capacity=32)


def test_floor_constraint_corrects_z_drift():
    true_plane = np.array([0.0, 0.0, 1.0, 0.8])  # ground at z = -0.8
    K = 8
    slam = RadarGraphSLAM(
        SLAMConfig(
            enable_preintegration=False,
            enable_loop_closure=False,
            enable_floor_constraint=True,
            keyframe_delta_trans=0.2,
            floor_distance_info=1e4,
            floor_normal_info=1e4,
            floor_robust_delta=np.inf,
        )
    )
    for k in range(K):
        T_true = np.eye(4)
        T_true[:3, 3] = [k * 1.0, 0.0, 0.0]
        # odometry drifts upward in z (anchor keyframe 0 stays exact)
        T_odo = T_true.copy()
        T_odo[2, 3] += 0.05 * k
        floor = np.asarray(
            transform_plane(jnp.asarray(T_true), jnp.asarray(true_plane))
        )
        assert slam.add_frame(float(k), _dummy_cloud(), T_odo, floor_coeffs=floor)
    opt = slam.optimize()
    assert opt is not None
    z = opt[:, 2, 3]
    # without the floor the drift reaches 0.4 m; with it, z must be near truth
    assert np.max(np.abs(z)) < 0.02, z
    np.testing.assert_allclose(slam.floor_plane, true_plane, atol=1e-2)


def test_floor_disabled_keeps_drift():
    """Sanity: without the constraint the z-drift stays (the factor really is
    what fixes it)."""
    slam = RadarGraphSLAM(
        SLAMConfig(
            enable_preintegration=False,
            enable_loop_closure=False,
            enable_floor_constraint=False,
        )
    )
    for k in range(5):
        T = np.eye(4)
        T[:3, 3] = [k * 1.0, 0.0, 0.05 * (k + 1)]
        slam.add_frame(float(k), _dummy_cloud(), T)
    opt = slam.optimize()
    assert abs(opt[-1, 2, 3] - 0.25) < 1e-3


def test_floor_keyframe_roundtrip(tmp_path):
    """floor_coeffs survive the keyframe save/load format (`keyframe.cpp:38`)."""
    slam = RadarGraphSLAM(SLAMConfig(enable_preintegration=False, enable_loop_closure=False))
    slam.add_frame(0.0, _dummy_cloud(), np.eye(4), floor_coeffs=[0.0, 0.0, 1.0, 0.7])
    slam.keyframes[0].save(str(tmp_path / "kf0"))
    from gorio_tpu.pipeline.keyframes import KeyFrame

    kf = KeyFrame.load(str(tmp_path / "kf0"))
    np.testing.assert_allclose(kf.floor_coeffs, [0.0, 0.0, 1.0, 0.7])
