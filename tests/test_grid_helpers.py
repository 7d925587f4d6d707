"""Unit tests for mass-grid evaluation helpers (no model needed)."""
import json
import os

import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals.grid import (
    midpoint_edges_from_values,
    parse_sweep_best,
    select_per_cell,
)


def test_midpoint_edges():
    centers, edges = midpoint_edges_from_values(np.array([10.0, 20.0, 40.0]))
    np.testing.assert_allclose(centers, [10, 20, 40])
    np.testing.assert_allclose(edges, [5, 15, 30, 50])
    c1, e1 = midpoint_edges_from_values(np.array([7.0, 7.0]))
    np.testing.assert_allclose(c1, [7.0])
    assert e1[0] < 7.0 < e1[1]


def test_select_per_cell_unordered_and_subsample(rng):
    m1 = np.array([30, 30, 30, 40, 20])
    m2 = np.array([20, 20, 20, 30, 30])
    # unordered folds (20, 30) into (30, 20)
    cells = select_per_cell(m1, m2, per_cell=2, min_per_cell=1, rng=rng,
                            unordered=True)
    assert set(cells.keys()) == {(30.0, 20.0), (40.0, 30.0)}
    assert len(cells[(30.0, 20.0)]) == 2          # subsampled from 4
    # min_per_cell filters sparse cells
    cells2 = select_per_cell(m1, m2, per_cell=0, min_per_cell=2, rng=rng,
                             unordered=True)
    assert set(cells2.keys()) == {(30.0, 20.0)}


def test_parse_sweep_best_from_final_results(tmp_path):
    d = str(tmp_path)
    combo = {"start_snr": 9.0, "cfg_scale": 1.7, "init_mode": "y-blend",
             "dc_weight": 0.05, "eta": 0.25, "cfg_mode": "gauss",
             "cfg_center": 0.6, "cfg_width": 0.2}
    with open(os.path.join(d, "final_results.json"), "w") as fh:
        json.dump([{"combo": combo, "J": 0.5, "steps": 120}], fh)
    knobs = parse_sweep_best(d)
    assert knobs["start_snr"] == 9.0 and knobs["steps"] == 120


def test_parse_sweep_best_from_cmd(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "best_cmd.txt"), "w") as fh:
        fh.write("gw-infer --steps 150 --eta 0.25 --start-snr 8.5 "
                 "--init-mode noise --cfg-scale 2.0 --cfg-mode const "
                 "--cfg-center 0.7 --cfg-width 0.1 --dc-weight 0.05\n")
    knobs = parse_sweep_best(d)
    assert knobs == {"steps": 150, "eta": 0.25, "start_snr": 8.5,
                     "init_mode": "noise", "cfg_scale": 2.0,
                     "cfg_mode": "const", "cfg_center": 0.7,
                     "cfg_width": 0.1, "dc_weight": 0.05}


def test_parse_sweep_best_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        parse_sweep_best(str(tmp_path))
