"""Offline viewer (counterpart of the rviz MarkerArray/map surfaces,
`radar_graph_slam_nodelet.cpp:885-1121`)."""

import json

import numpy as np

from gorio_tpu.utils.viz import render_run


def test_render_run_all_layers(tmp_path):
    mk = {
        "nodes": [
            {"id": i, "stamp": float(i), "position": [float(i), float(i % 3), 0.0]}
            for i in range(10)
        ],
        "edges": [{"from": i - 1, "to": i, "type": "odometry"} for i in range(1, 10)],
        "loops": [{"from": 1, "to": 8, "fitness": 0.2}],
        "loop_search_radius": 20.0,
    }
    (tmp_path / "m.json").write_text(json.dumps(mk))
    np.savez(tmp_path / "map.npz", xyz=np.random.default_rng(0).normal(size=(2000, 3)))
    with open(tmp_path / "est.tum", "w") as f:
        for i in range(10):
            f.write(f"{i} {i} {i % 3} 0 0 0 0 1\n")
    out = render_run(
        str(tmp_path / "out.png"),
        markers_json=str(tmp_path / "m.json"),
        trajectory_tum=str(tmp_path / "est.tum"),
        groundtruth_tum=str(tmp_path / "est.tum"),
        map_npz=str(tmp_path / "map.npz"),
        title="test",
    )
    import os

    assert os.path.getsize(out) > 10_000  # a real rendered image, not a stub
