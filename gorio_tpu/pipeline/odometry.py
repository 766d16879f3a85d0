"""Scan-matching odometry front-end.

TPU-native counterpart of `ScanMatchingOdometryNodelet`
(`apps/scan_matching_odometry_nodelet.cpp`): per synced (ego-velocity, cloud)
pair, align the new scan to the current keyframe scan with the cumulative
ego-velocity transform as the initial guess (`guess = prev_trans * egovel_cum`,
`:458-462`), sanity-threshold the result against the ego-velocity prediction
(`:497-570` fallback), and refresh the keyframe target on the delta gates
(`:578-600`). The registration itself is one jitted APDGICP/NDT program; the
thin sequential state machine lives on the host (the scan-to-scan recursion is
inherently serial — SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.pointcloud import PointCloud
from ..registration.gicp import GICPConfig, gicp_align, prepare_gicp, make_gicp_callbacks
from ..registration.lsq import lm_optimize
from ..registration.ndt import NDTConfig, ndt_align


class OdometryConfig(NamedTuple):
    """Defaults mirror the nodelet params (`:116-127`)."""

    keyframe_delta_trans: float = 0.25
    keyframe_delta_angle: float = 0.15
    keyframe_delta_time: float = 1.0
    max_acceptable_trans: float = 1.0
    max_acceptable_angle: float = 1.0  # rad
    max_diff_trans: float = 1.0
    max_diff_angle: float = 1.0
    max_egovel_cum: float = 1.0
    registration: str = "apdgicp"  # "apdgicp" | "gicp" | "ndt"
    gicp: GICPConfig = GICPConfig()
    ndt: NDTConfig = NDTConfig()
    # scan-to-submap mode (`:602-618`): register against the merged last-N
    # keyframe clouds instead of the single last keyframe
    enable_scan_to_map: bool = False
    max_submap_frames: int = 5
    submap_resolution: float = 0.25
    submap_capacity: int = 8192


class OdometryStatus(NamedTuple):
    """Parity: `ScanMatchingStatus.msg` fields we can fill."""

    converged: bool
    matching_error: float
    relative_pose: np.ndarray
    prediction_error: Optional[np.ndarray]
    used_prediction: bool


@dataclass
class ScanMatchingOdometry:
    cfg: OdometryConfig = OdometryConfig()
    # state (parity: member vars of the nodelet)
    odom: np.ndarray = field(default_factory=lambda: np.eye(4))
    keyframe_pose: np.ndarray = field(default_factory=lambda: np.eye(4))
    keyframe_cloud: Optional[PointCloud] = None
    keyframe_stamp: float = 0.0
    prev_trans_s2s: np.ndarray = field(default_factory=lambda: np.eye(4))
    egovel_cum: np.ndarray = field(default_factory=lambda: np.eye(4))
    last_stamp: Optional[float] = None
    statuses: list = field(default_factory=list)
    # scan-to-map state: (pose, cloud) of the last N keyframes
    _submap_frames: list = field(default_factory=list)

    def _rebuild_submap(self):
        """Merge the last-N keyframe clouds into the current keyframe frame
        (`:602-618`); fixed-capacity voxel downsample keeps shapes static."""
        from ..core.pointcloud import make_cloud, voxel_downsample
        import jax.numpy as jnp

        ref_pose_inv = np.linalg.inv(self.keyframe_pose)
        pts = []
        for pose, cloud in self._submap_frames[-self.cfg.max_submap_frames :]:
            T = ref_pose_inv @ pose
            xyz = np.asarray(cloud.xyz)
            m = np.asarray(cloud.mask)
            pts.append(xyz[m] @ T[:3, :3].T + T[:3, 3])
        allpts = np.concatenate(pts, axis=0)
        merged = make_cloud(jnp.asarray(allpts), capacity=max(len(allpts), 1))
        merged = voxel_downsample(merged, self.cfg.submap_resolution)
        # repack to the fixed submap capacity (valid points first)
        xyz = np.asarray(merged.xyz)[np.asarray(merged.mask)]
        self.keyframe_cloud = make_cloud(
            jnp.asarray(xyz[: self.cfg.submap_capacity]), capacity=self.cfg.submap_capacity
        )

    def _align(self, source: PointCloud, target: PointCloud, guess):
        if self.cfg.registration == "ndt":
            return ndt_align(source, target, init_T=jnp.asarray(guess), cfg=self.cfg.ndt)
        cfg = self.cfg.gicp._replace(mode=self.cfg.registration)
        return gicp_align(source, target, init_T=jnp.asarray(guess), cfg=cfg)

    def step(self, stamp: float, cloud: PointCloud, ego_vel: np.ndarray) -> np.ndarray:
        """Process one frame; returns the 4x4 odometry pose (map<-body)."""
        if self.keyframe_cloud is None:
            self.keyframe_cloud = cloud
            self.keyframe_stamp = stamp
            self.last_stamp = stamp
            if self.cfg.enable_scan_to_map:
                self._submap_frames.append((self.keyframe_pose.copy(), cloud))
            return self.odom.copy()

        # cumulative ego-velocity delta since the last frame (`:356-365`)
        dt = stamp - self.last_stamp
        self.last_stamp = stamp
        step_T = np.eye(4)
        step_T[:3, 3] = np.asarray(ego_vel) * dt
        egovel_cum = self.egovel_cum @ step_T
        if np.linalg.norm(egovel_cum[:3, 3]) > self.cfg.max_egovel_cum:
            egovel_cum = self.egovel_cum  # guard (`:364`)
        self.egovel_cum = egovel_cum

        guess = self.prev_trans_s2s @ self.egovel_cum
        res = self._align(cloud, self.keyframe_cloud, guess)
        T = np.asarray(res.T)

        # sanity thresholding vs the ego-velocity prediction (`:497-570`)
        delta = np.linalg.inv(self.prev_trans_s2s) @ T
        dx = float(np.linalg.norm(delta[:3, 3]))
        da = float(
            lie.rotation_geodesic_angle(jnp.asarray(delta[:3, :3]), jnp.eye(3))
        )
        pred = self.prev_trans_s2s @ self.egovel_cum
        diff = np.linalg.inv(pred) @ T
        ddx = float(np.linalg.norm(diff[:3, 3]))
        dda = float(lie.rotation_geodesic_angle(jnp.asarray(diff[:3, :3]), jnp.eye(3)))
        used_prediction = False
        if (
            not bool(res.converged)
            or dx > self.cfg.max_acceptable_trans
            or da > self.cfg.max_acceptable_angle
            or ddx > self.cfg.max_diff_trans
            or dda > self.cfg.max_diff_angle
        ):
            T = pred  # fall back to the motion prediction (`:535-561`)
            used_prediction = True

        self.statuses.append(
            OdometryStatus(
                converged=bool(res.converged),
                matching_error=float(res.error),
                relative_pose=delta,
                prediction_error=diff,
                used_prediction=used_prediction,
            )
        )

        self.prev_trans_s2s = T
        self.egovel_cum = np.eye(4)
        self.odom = self.keyframe_pose @ T

        # keyframe refresh (`:578-600`)
        ddx_kf = float(np.linalg.norm(T[:3, 3]))
        dda_kf = float(lie.rotation_geodesic_angle(jnp.asarray(T[:3, :3]), jnp.eye(3)))
        ddt_kf = stamp - self.keyframe_stamp
        if (
            ddx_kf > self.cfg.keyframe_delta_trans
            or dda_kf > self.cfg.keyframe_delta_angle
            or ddt_kf > self.cfg.keyframe_delta_time
        ):
            self.keyframe_pose = self.odom.copy()
            self.keyframe_stamp = stamp
            self.prev_trans_s2s = np.eye(4)
            if self.cfg.enable_scan_to_map:
                self._submap_frames.append((self.keyframe_pose.copy(), cloud))
                self._rebuild_submap()
            else:
                self.keyframe_cloud = cloud

        return self.odom.copy()
