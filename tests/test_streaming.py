"""Streaming replay driver: backpressure modes + deadline accounting
(parity: `bag_player.py` + `/read_until`, `scan_matching_odometry_nodelet.
cpp:383-389`)."""

import numpy as np
import pytest

from gorio_tpu.io import native as gn
from gorio_tpu.pipeline.odometry import OdometryConfig, ScanMatchingOdometry
from gorio_tpu.pipeline.slam import RadarGraphSLAM, SLAMConfig
from gorio_tpu.pipeline.streaming import stream_sequence


@pytest.fixture(scope="module")
def tiny_sequence(tmp_path_factory):
    from gorio_tpu.io.synthetic import make_world, render_radar_scan, sample_imu, simulate_trajectory

    out = tmp_path_factory.mktemp("stream_seq")
    traj = simulate_trajectory(seed=3, duration=3.0)
    imu = sample_imu(traj, seed=4)
    world = make_world(seed=5, n_landmarks=3000)
    stamps = np.arange(0.2, 2.8, 0.1)
    for i, t in enumerate(stamps):
        R, p = traj.interp_pose(np.array([t]))
        v = np.stack([np.interp(t, traj.t, traj.v_body[:, k]) for k in range(3)])
        cloud = render_radar_scan(world, R[0], p[0], v, capacity=512, seed=100 + i)
        m = np.asarray(cloud.mask)
        gn.write_frame(
            out / f"{i:06d}.grf", float(t),
            np.asarray(cloud.xyz)[m], np.asarray(cloud.intensity)[m],
            np.asarray(cloud.doppler)[m],
        )
    np.savez(out / "imu.npz", gyr_t=imu.gyr_t, gyr=imu.gyr, vel_t=imu.vel_t,
             vel=imu.vel, gyr_var=imu.gyr_var, vel_var=imu.vel_var)
    return out


def _run(tiny_sequence, mode, rate):
    imu = np.load(tiny_sequence / "imu.npz")
    slam = RadarGraphSLAM(SLAMConfig(enable_loop_closure=False, enable_preintegration=False))
    for t, g in zip(imu["gyr_t"], imu["gyr"]):
        slam.push_imu(t, g)
    odo = ScanMatchingOdometry(OdometryConfig())
    frames = sorted(tiny_sequence.glob("*.grf"))
    report = stream_sequence(
        frames, slam, odo, imu={"gyr_t": imu["gyr_t"], "gyr": imu["gyr"]},
        rate_multiplier=rate, mode=mode, capacity=512,
    )
    return report


def test_stream_block_mode(tiny_sequence):
    """Block mode loses nothing and reports deadline stats."""
    report = _run(tiny_sequence, "block", rate=8.0)
    assert report.n_frames == 26
    assert report.n_processed == 26
    assert report.n_dropped == 0
    assert report.latency_p50_ms > 0
    assert 0.0 <= report.on_time_frac <= 1.0
    assert report.recording_s > 2.0
    assert report.realtime_factor > 0


def test_stream_drop_mode_under_pressure(tiny_sequence):
    """At an aggressive replay rate on CPU the drop-mode producer must not
    stall: every frame is either processed or counted as dropped."""
    report = _run(tiny_sequence, "drop", rate=50.0)
    assert report.n_frames == 26
    assert report.n_processed + report.n_dropped == 26
    assert report.mode == "drop"


def test_stream_report_json_roundtrip(tiny_sequence):
    import json

    report = _run(tiny_sequence, "block", rate=10.0)
    d = json.loads(report.to_json())
    for key in ("on_time_frac", "latency_p95_ms", "realtime_factor", "n_keyframes"):
        assert key in d


def test_stream_cli_end_to_end(tiny_sequence, tmp_path):
    """The `stream` subcommand drives the same path users invoke: replay,
    report JSON, final optimized trajectory."""
    import json

    from gorio_tpu.cli import main

    report_p = tmp_path / "stream.json"
    out_p = tmp_path / "est.tum"
    main([
        "stream", "--dataset", str(tiny_sequence), "--rate-multiplier", "10",
        "--capacity", "512", "--no-loops", "--report-out", str(report_p),
        "--output", str(out_p), "--no-warmup",
    ])
    rep = json.loads(report_p.read_text())
    assert rep["n_processed"] + rep["n_dropped"] == rep["n_frames"] == 26
    assert rep["n_keyframes"] > 10
    from gorio_tpu.io.tum import load_tum

    stamps, poses = load_tum(out_p)
    assert len(stamps) == rep["n_keyframes"]


def test_stream_producer_error_propagates(tiny_sequence, tmp_path):
    """A corrupt frame mid-stream must surface in the consumer, not hang it
    (advisor r3: sentinel was outside try/finally)."""
    frames = sorted(tiny_sequence.glob("*.grf"))[:6]
    bad = tmp_path / "bad.grf"
    bad.write_bytes(b"\x00" * 16)  # invalid magic/truncated
    frames = frames[:3] + [bad] + frames[3:]
    slam = RadarGraphSLAM(SLAMConfig(enable_loop_closure=False, enable_preintegration=False))
    odo = ScanMatchingOdometry(OdometryConfig())
    with pytest.raises(Exception):
        stream_sequence(frames, slam, odo, rate_multiplier=50.0, mode="block",
                        capacity=512)


def test_stream_async_optimize(tiny_sequence):
    """Async periodic optimization runs on the worker thread concurrent with
    ingest (the reference's optimization-timer thread,
    `radar_graph_slam_nodelet.cpp:750-834`), cycles are counted+timed, and
    the optimized correction lands (trans_odom2map != I)."""
    imu = np.load(tiny_sequence / "imu.npz")
    slam = RadarGraphSLAM(SLAMConfig(enable_loop_closure=False, enable_preintegration=False))
    for t, g in zip(imu["gyr_t"], imu["gyr"]):
        slam.push_imu(t, g)
    odo = ScanMatchingOdometry(OdometryConfig())
    frames = sorted(tiny_sequence.glob("*.grf"))
    report = stream_sequence(
        frames, slam, odo, imu={"gyr_t": imu["gyr_t"], "gyr": imu["gyr"]},
        rate_multiplier=8.0, mode="block", capacity=512,
        optimize_every=5, optimize_async=True,
    )
    assert report.n_processed == 26
    assert report.n_opt_cycles >= 1
    assert report.opt_max_ms > 0
    # every keyframe that an optimize cycle covered carries an optimized pose
    assert any(kf.optimized_pose is not None for kf in slam.keyframes)
