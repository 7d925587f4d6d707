"""End-to-end CLI chain: gen -> train -> infer -> sweep -> grid.

Exercises the five entry points and the two cross-layer contracts between
them (HDF5 schema, checkpoint schema) plus the sweep->grid knob handoff
(SURVEY.md §1 contracts)."""
import json
import os

import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli import (
    gen as cli_gen,
    grid as cli_grid,
    infer as cli_infer,
    sweep as cli_sweep,
    train as cli_train,
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_e2e")
    return str(d)


@pytest.fixture(scope="module")
def dataset(workdir):
    path = os.path.join(workdir, "ds.h5")
    cli_gen.main([
        "--mode", "grid", "--num-samples", "12", "--output-path", path,
        "--mass1-min", "30", "--mass1-max", "42", "--mass2-min", "30",
        "--mass2-max", "42", "--grid-steps", "2", "--snr-min", "15",
        "--snr-max", "25", "--save-psd", "--shuffle", "--seed", "3"])
    return path


@pytest.fixture(scope="module")
def checkpoint(workdir, dataset):
    mdir = os.path.join(workdir, "model")
    cli_train.main([
        "--data", dataset, "--model_dir", mdir, "--epochs", "1",
        "--batch-size", "4", "--base_ch", "8", "--time_dim", "16",
        "--depth", "2", "--T", "50", "--whiten", "1", "--whiten_mode",
        "model", "--warmup_steps", "2", "--no-bf16"])
    return os.path.join(mdir, "latest_model", "model_diffusion.msgpack")


def test_gen_schema(dataset):
    import h5py

    with h5py.File(dataset, "r") as f:
        assert len(f["signal"]) == 12
        for k in ["noise", "noisy", "times", "t_merger", "lengths", "mass1",
                  "mass2", "snr", "q", "chirp_mass", "label_m1", "psd",
                  "psd_model", "psd_welch", "psd_welch_freqs", "psd_detector"]:
            assert k in f, k
        assert f.attrs["padding"] == "none"
        assert f.attrs["time_axis"] == "seconds-rel-peak"
        assert json.loads(f.attrs["config_args"])["mode"] == "grid"
        # physical-unit PSD survives storage (float64 deviation)
        P = np.asarray(f["psd_model"][0])
        assert P.max() < 1e-40 and P[P > 0].min() > 0
        # merger-centred times: t=0 at |signal| peak
        s0 = np.asarray(f["signal"][0])
        t0 = np.asarray(f["times"][0])
        assert t0[np.argmax(np.abs(s0))] == pytest.approx(0.0)


def test_infer_cli(workdir, dataset, checkpoint):
    out = os.path.join(workdir, "infer")
    cli_infer.main([
        "--input-h5", dataset, "--index", "0", "--model", checkpoint,
        "--outdir", out, "--steps", "4", "--whiten", "1", "--whiten-mode",
        "model", "--one-step-proxy", "--run-tag", "t"])
    with open(os.path.join(out, "metrics_t.json")) as fh:
        m = json.load(fh)
    assert "strain" in m and "merger" in m and "proxy" in m
    assert np.isfinite(m["strain"]["corr_last"])
    assert os.path.exists(os.path.join(out, "recon_t.npy"))


def test_sweep_and_grid_handoff(workdir, dataset, checkpoint):
    sweep_out = os.path.join(workdir, "sweep")
    cli_sweep.main([
        "--input-h5", dataset, "--indices", "0", "1", "--model", checkpoint,
        "--outdir", sweep_out, "--grid", "--grid-snr", "8", "--grid-cfg",
        "1.0", "--grid-init", "noise", "--grid-dc", "0.0", "--grid-eta",
        "0.0", "--steps-coarse", "4", "--whiten", "1", "--whiten-mode",
        "model"])
    assert os.path.exists(os.path.join(sweep_out, "best_cmd.txt"))
    with open(os.path.join(sweep_out, "grid_results.json")) as fh:
        res = json.load(fh)
    assert len(res) == 1 and np.isfinite(res[0]["J"])

    grid_out = os.path.join(workdir, "grid")
    cli_grid.main([
        "--input-h5", dataset, "--model", checkpoint, "--outdir", grid_out,
        "--from-sweep", sweep_out, "--steps", "4", "--per-cell", "1",
        "--whiten", "1", "--whiten-mode", "model", "--unordered"])
    for art in ["per_index_metrics.csv", "metrics_grid.csv",
                "metrics_grid.json", "heat_corr.png", "heat_mae.png",
                "summary.json"]:
        assert os.path.exists(os.path.join(grid_out, art)), art
    with open(os.path.join(grid_out, "summary.json")) as fh:
        s = json.load(fh)
    # knobs flowed from the sweep artifacts
    assert s["knobs"]["cfg_scale"] == 1.0
    assert np.isfinite(s["corr_macro_mean"])
    # SNR-stratified breakdown (extension): per-row snr column + tercile
    # summary whose bins partition the evaluated rows
    with open(os.path.join(grid_out, "per_index_metrics.csv")) as fh:
        header = fh.readline().strip().split(",")
    assert "snr" in header
    assert "by_snr" in s, "dataset carries snr -> summary must stratify"
    assert sum(b["n"] for b in s["by_snr"]) == s["n_rows"]
    assert all(np.isfinite(b["corr_mean"]) for b in s["by_snr"])
    los = [b["snr_lo"] for b in s["by_snr"]]
    assert los == sorted(los)


def test_grid_uncertainty_block(workdir, dataset, checkpoint):
    """--avg-seeds > 1 -> per-row seed-ensemble scatter (unc_rel) lands in
    the CSV and the summary gains an uncertainty-calibration block
    (extension; no reference counterpart)."""
    out = os.path.join(workdir, "grid_unc")
    cli_grid.main([
        "--input-h5", dataset, "--model", checkpoint, "--outdir", out,
        "--steps", "4", "--per-cell", "2", "--avg-seeds", "2",
        "--whiten", "1", "--whiten-mode", "model", "--unordered"])
    with open(os.path.join(out, "per_index_metrics.csv")) as fh:
        header = fh.readline().strip().split(",")
    assert "unc_rel" in header
    with open(os.path.join(out, "summary.json")) as fh:
        s = json.load(fh)
    unc = s.get("uncertainty")
    assert unc is not None
    assert unc["n"] >= 3
    assert unc["unc_rel_mean"] > 0 and np.isfinite(unc["unc_rel_mean"])
    # rank correlation is a correlation: bounded
    assert -1.0 <= unc["spearman_unc_vs_err"] <= 1.0
    # residual-whiteness block rides the same eval rows
    res = s.get("residuals")
    assert res is not None
    for k in ("res_std_ratio", "res_clean_corr", "res_flatness"):
        assert k in res and np.isfinite(res[k]["mean"])
    assert res["res_clean_corr"]["mean"] <= 1.0


def test_gen_fixed_and_random_modes(tmp_path):
    import h5py

    fixed = str(tmp_path / "fixed.h5")
    cli_gen.main([
        "--mode", "fixed", "--num-samples", "5", "--output-path", fixed,
        "--mass1", "35", "--mass2", "30", "--snr", "18", "--seed", "1"])
    with h5py.File(fixed, "r") as f:
        assert len(f["signal"]) == 5
        assert np.allclose(f["mass1"][:], 35.0)
        assert np.allclose(f["snr"][:], 18.0)

    rand = str(tmp_path / "rand.h5")
    cli_gen.main([
        "--mode", "random", "--num-samples", "6", "--output-path", rand,
        "--mass1-min", "20", "--mass1-max", "50", "--mass2-min", "20",
        "--mass2-max", "50", "--snr-min", "10", "--snr-max", "30",
        "--spin1-min", "-0.5", "--spin1-max", "0.5", "--seed", "2"])
    with h5py.File(rand, "r") as f:
        m1 = np.asarray(f["mass1"][:])
        m2 = np.asarray(f["mass2"][:])
        assert len(m1) == 6
        assert (m1 >= m2).all()                      # sorted convention
        assert (np.asarray(f["snr"][:]) >= 10).all()
        s1 = np.asarray(f["spin1z"][:])
        assert (np.abs(s1) <= 0.5).all()


def test_grid_chunked_eval_matches_row_count(workdir, dataset, checkpoint):
    """Round-5b HBM-aware chunking: forcing a scan cap smaller than the
    per-length batch (so the last chunk is PADDED) must still score every
    sample exactly once, with finite metrics and the uncertainty block
    intact — at 16 kHz the unchunked batch would not fit on the chip."""
    out = os.path.join(workdir, "grid_chunked")
    cli_grid.main([
        "--input-h5", dataset, "--model", checkpoint, "--outdir", out,
        "--steps", "4", "--per-cell", "3", "--avg-seeds", "2",
        "--eval-scan-cap", "2",
        "--whiten", "1", "--whiten-mode", "model", "--unordered"])
    import csv
    with open(os.path.join(out, "per_index_metrics.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) >= 3
    assert len({r["index"] for r in rows}) == len(rows)  # each scored once
    assert all(np.isfinite(float(r["corr"])) for r in rows)
    assert all(float(r["unc_rel"]) > 0 for r in rows)    # std survived chunking
    with open(os.path.join(out, "summary.json")) as fh:
        s = json.load(fh)
    assert np.isfinite(s["corr_macro_mean"])


def test_gen_taper_default_is_engine_dependent(tmp_path):
    """Round-5b: --f-taper-frac defaults to 0.85 for the PN engine (wins the
    fidelity AND end-to-end A/Bs), 1.0 for non-PN engines (which don't
    consume it); an EXPLICIT sub-1.0 value with a non-PN engine still
    errors instead of being silently dropped."""
    import h5py
    import json

    pn = str(tmp_path / "pn.h5")
    cli_gen.main(["--mode", "fixed", "--num-samples", "1",
                  "--output-path", pn, "--mass1", "35", "--mass2", "30"])
    with h5py.File(pn, "r") as f:
        assert json.loads(f.attrs["config_args"])["f_taper_frac"] == 0.85

    newt = str(tmp_path / "newt.h5")
    cli_gen.main(["--mode", "fixed", "--num-samples", "1",
                  "--output-path", newt, "--mass1", "35", "--mass2", "30",
                  "--approximant", "newtonian"])
    with h5py.File(newt, "r") as f:
        assert json.loads(f.attrs["config_args"])["f_taper_frac"] == 1.0

    with pytest.raises(SystemExit, match="f-taper-frac"):
        cli_gen.main(["--mode", "fixed", "--num-samples", "1",
                      "--output-path", str(tmp_path / "x.h5"),
                      "--mass1", "35", "--mass2", "30",
                      "--approximant", "newtonian", "--f-taper-frac", "0.9"])


def test_gen_probe_rejects_impossible_config(tmp_path):
    # total mass ~600 Msun -> ISCO below f_lower: probe must fail
    with pytest.raises(SystemExit):
        cli_gen.main([
            "--mode", "fixed", "--num-samples", "1",
            "--output-path", str(tmp_path / "x.h5"),
            "--mass1", "300", "--mass2", "300"])


def test_sweep_random_mode(workdir, dataset, checkpoint):
    out = os.path.join(workdir, "sweep_rand")
    cli_sweep.main([
        "--input-h5", dataset, "--indices", "0", "--model", checkpoint,
        "--outdir", out, "--n-coarse", "3", "--topk", "2",
        "--steps-coarse", "4", "--steps-refine", "6", "--seeds-refine", "2",
        "--whiten", "1", "--whiten-mode", "model", "--seed", "5"])
    with open(os.path.join(out, "coarse_top.json")) as fh:
        top = json.load(fh)
    assert len(top) == 2
    with open(os.path.join(out, "final_results.json")) as fh:
        finals = json.load(fh)
    assert len(finals) == 2
    assert all(len(r["J_seeds"]) == 2 for r in finals)
    assert finals[0]["J"] >= finals[1]["J"]        # sorted best-first
    assert os.path.exists(os.path.join(out, "best_cmd.txt"))


def test_sweep_grid_inherit_pred_type_v(workdir, dataset):
    """Regression: a v-prediction checkpoint must be decoded with v algebra
    by gw-sweep/gw-grid (ADVICE r1 high: _sampler_config defaulted to eps)."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals.sweep import (
        Combo,
        _sampler_config,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
        load_model,
    )

    mdir = os.path.join(workdir, "model_v")
    cli_train.main([
        "--data", dataset, "--model_dir", mdir, "--epochs", "1",
        "--batch-size", "4", "--base_ch", "8", "--time_dim", "16",
        "--depth", "2", "--T", "50", "--whiten", "1", "--whiten_mode",
        "model", "--warmup_steps", "2", "--no-bf16", "--pred_type", "v"])
    ckpt = os.path.join(mdir, "latest_model", "model_diffusion.msgpack")

    _, _, schedule, ck = load_model(ckpt)
    assert ck["pred_type"] == "v"
    combo = Combo(start_snr=8.0, cfg_scale=1.0, init_mode="noise",
                  dc_weight=0.0, eta=0.0)
    cfg = _sampler_config(combo, 4, schedule, ck, use_selfcond=True)
    assert cfg.pred_type == "v"
    # gw-grid --start-t override wins over the snr-derived start
    cfg2 = _sampler_config(combo, 4, schedule, ck, use_selfcond=True,
                           start_t_override=37)
    assert cfg2.start_t == 37

    # the full sweep path runs with the v checkpoint
    out = os.path.join(workdir, "sweep_v")
    cli_sweep.main([
        "--input-h5", dataset, "--indices", "0", "--model", ckpt,
        "--outdir", out, "--grid", "--grid-snr", "8", "--grid-cfg", "1.0",
        "--grid-init", "noise", "--grid-dc", "0.0", "--grid-eta", "0.0",
        "--steps-coarse", "4", "--whiten", "1", "--whiten-mode", "model"])
    with open(os.path.join(out, "grid_results.json")) as fh:
        res = json.load(fh)
    assert np.isfinite(res[0]["J"])


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_params,
        save_checkpoint,
        select_weights,
    )

    params = {"params": {"layer": {"kernel": np.ones((3, 4), np.float32),
                                   "bias": np.zeros((4,), np.float32)}}}
    ema = {"params": {"layer": {"kernel": 2 * np.ones((3, 4), np.float32),
                                "bias": np.ones((4,), np.float32)}}}
    args = {"T": 1000, "base_ch": 64, "meta_scale": {"M": 45.0, "q": 1.8}}
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, params, args, epoch=7, model_ema_state=ema)

    ck = load_checkpoint(path)
    assert ck["epoch"] == 7
    assert ck["args"]["meta_scale"]["M"] == 45.0
    w, used_ema = select_weights(ck, use_ema=True)
    assert used_ema
    restored = restore_params(params, w)
    np.testing.assert_allclose(
        restored["params"]["layer"]["kernel"], 2.0)
    w2, used = select_weights(ck, use_ema=False)
    restored2 = restore_params(params, w2)
    np.testing.assert_allclose(restored2["params"]["layer"]["kernel"], 1.0)
    # human-readable sidecar exists
    assert os.path.exists(path + ".args.json")


def test_gen_symmetric_augmentation(tmp_path):
    """Half of each unequal-mass cell carries swapped labels (masses AND
    spins); generation masses stay sorted m1 >= m2 (ref gen.py:719-747)."""
    import h5py

    path = str(tmp_path / "aug.h5")
    cli_gen.main([
        "--mode", "grid", "--num-samples", "16", "--output-path", path,
        "--mass1-min", "30", "--mass1-max", "40", "--mass2-min", "30",
        "--mass2-max", "40", "--grid-steps", "2", "--snr-min", "15",
        "--snr-max", "15", "--spin1-min", "0.1", "--spin1-max", "0.1",
        "--spin2-min", "-0.2", "--spin2-max", "-0.2",
        "--augment-symmetric", "--overgen-factor", "1.0", "--seed", "9"])
    with h5py.File(path, "r") as f:
        m1 = np.asarray(f["mass1"][:])
        m2 = np.asarray(f["mass2"][:])
        l1 = np.asarray(f["label_m1"][:])
        l2 = np.asarray(f["label_m2"][:])
        ls1 = np.asarray(f["label_s1"][:])
        assert (m1 >= m2).all()                       # generation sorted
        swapped = l1 < l2
        unequal = ~np.isclose(l1, l2)
        # the (30,40) cell contributes both orientations
        assert swapped.any() and (unequal & ~swapped).any()
        # swapped samples also swap spin labels
        assert np.allclose(ls1[swapped], -0.2)
        assert np.allclose(ls1[unequal & ~swapped], 0.1)


def test_welch_whitening_path(tmp_path):
    """gen --psd-source both -> train/infer with whiten_mode=welch."""
    import h5py

    path = str(tmp_path / "w.h5")
    cli_gen.main([
        "--mode", "fixed", "--num-samples", "6", "--output-path", path,
        "--mass1", "35", "--mass2", "30", "--snr", "18", "--save-psd",
        "--psd-source", "both", "--seed", "4"])
    with h5py.File(path, "r") as f:
        assert "psd_welch" in f and "psd_welch_freqs" in f

    mdir = str(tmp_path / "m")
    cli_train.main([
        "--data", path, "--model_dir", mdir, "--epochs", "1",
        "--batch-size", "3", "--base_ch", "8", "--time_dim", "16",
        "--depth", "1", "--T", "20", "--whiten", "1", "--whiten_mode",
        "welch", "--warmup_steps", "2", "--no-bf16"])
    ckpt = os.path.join(mdir, "latest_model", "model_diffusion.msgpack")

    out = str(tmp_path / "infer")
    # domain flags inherited from the checkpoint (welch)
    cli_infer.main([
        "--input-h5", path, "--index", "0", "--model", ckpt,
        "--outdir", out, "--steps", "3", "--run-tag", "w"])
    with open(os.path.join(out, "metrics_w.json")) as fh:
        m = json.load(fh)
    assert m["whiten_kind"] == "welch"
    assert np.isfinite(m["strain"]["corr_last"])
    # residual-whiteness diagnostics ride every infer run (clean-referenced
    # members present here because the dataset carries the clean waveform)
    res = m["residuals"]
    for k in ("res_flatness", "res_std_ratio", "res_clean_corr"):
        assert k in res and np.isfinite(res[k])


def test_train_whitening_auto_cascade(tmp_path):
    """whiten_mode=auto end-to-end consistency. Since r4 a dataset without
    saved PSDs still yields MODEL whitening (the analytic PSD is derived
    from the stored grid scalars), recorded as the checkpoint's resolved
    domain and inherited by inference.  With the grid scalars stripped too,
    auto falls through to self-estimated 'train' whitening on both sides."""
    import h5py

    path = str(tmp_path / "nopsd.h5")
    cli_gen.main([
        "--mode", "fixed", "--num-samples", "4", "--output-path", path,
        "--mass1", "35", "--mass2", "30", "--snr", "18", "--seed", "6"])

    def train_and_infer(h5, tag):
        mdir = str(tmp_path / ("m_" + tag))
        cli_train.main([
            "--data", h5, "--model_dir", mdir, "--epochs", "1",
            "--batch-size", "2", "--base_ch", "8", "--time_dim", "16",
            "--depth", "1", "--T", "10", "--whiten", "1", "--whiten_mode",
            "auto", "--warmup_steps", "1", "--no-bf16"])
        ckpt = os.path.join(mdir, "latest_model", "model_diffusion.msgpack")
        with open(ckpt + ".args.json") as fh:
            resolved = json.load(fh)["whiten_mode_resolved"]
        out = str(tmp_path / ("infer_" + tag))
        cli_infer.main([
            "--input-h5", h5, "--index", "0", "--model", ckpt,
            "--outdir", out, "--steps", "3", "--run-tag", "t"])
        with open(os.path.join(out, "metrics_t.json")) as fh:
            m = json.load(fh)
        assert np.isfinite(m["strain"]["corr_last"])
        return resolved, m["whiten_kind"]

    # derivable grid scalars present -> model domain, train == infer
    assert train_and_infer(path, "model") == ("model", "model")

    # scalars stripped -> genuine fall-through to 'train' on both sides
    bare = str(tmp_path / "noscalars.h5")
    import shutil
    shutil.copy(path, bare)
    with h5py.File(bare, "a") as f:
        for k in ("psd_len", "psd_df", "psd_f_lower"):
            del f[k]
    assert train_and_infer(bare, "train") == ("train", "train")


def test_sweep_grid_inherit_whiten_domain(workdir, dataset, checkpoint):
    """Regression: gw-sweep/gw-grid default their domain flags (whiten,
    whiten-mode, sigma-mode) from the CHECKPOINT like gw-infer does — a
    whiten-trained model evaluated on raw strain scores garbage silently
    (observed: 'sigma degenerate; fallback' warnings and corr ~ 0)."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.grid import (
        _inherit_domain_flags,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
        load_model,
    )

    _, _, _, ck = load_model(checkpoint)
    assert bool(ck.get("whiten")) is True

    class A:
        whiten = None
        whiten_mode = None
        sigma_mode = None

    a = A()
    _inherit_domain_flags(a, ck)
    assert a.whiten == 1
    assert a.whiten_mode == ck["whiten_mode"]
    assert a.sigma_mode == ck["sigma_mode"]

    # explicit flags still win
    b = A(); b.whiten = 0; b.whiten_mode = "welch"; b.sigma_mode = "mad"
    _inherit_domain_flags(b, ck)
    assert (b.whiten, b.whiten_mode, b.sigma_mode) == (0, "welch", "mad")

    # e2e: sweep with NO domain flags on a whiten-trained ckpt
    out = os.path.join(workdir, "sweep_inherit")
    cli_sweep.main([
        "--input-h5", dataset, "--indices", "0", "--model", checkpoint,
        "--outdir", out, "--grid", "--grid-snr", "8", "--grid-cfg", "1.0",
        "--grid-init", "noise", "--grid-dc", "0.0", "--grid-eta", "0.0",
        "--steps-coarse", "4"])
    with open(os.path.join(out, "grid_results.json")) as fh:
        res = json.load(fh)
    assert np.isfinite(res[0]["J"])


def test_grid_cli_dpmpp_sampler(workdir, dataset, checkpoint):
    """gw-grid --sampler dpmpp runs end-to-end and emits a summary."""
    out = os.path.join(workdir, "grid_dpmpp")
    cli_grid.main([
        "--input-h5", dataset, "--model", checkpoint, "--outdir", out,
        "--steps", "4", "--sampler", "dpmpp", "--per-cell", "1",
        "--min-per-cell", "1"])
    with open(os.path.join(out, "summary.json")) as fh:
        s = json.load(fh)
    assert "corr_macro" in json.dumps(s)


def test_dpmpp_defaults_to_lambda_ladder(workdir, dataset, checkpoint):
    """--sampler dpmpp without --ladder must use the lambda-uniform ladder
    (the t-ladder's uneven lambda intervals collapse dpmpp at low steps:
    measured 0.287 vs 0.662 corr_macro at 20 steps)."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.grid import (
        build_parser,
    )

    p = build_parser()
    a = p.parse_args(["--input-h5", "x", "--model", "y",
                      "--sampler", "dpmpp"])
    ladder = a.ladder or ("lambda" if a.sampler == "dpmpp" else "t")
    assert ladder == "lambda"
    a2 = p.parse_args(["--input-h5", "x", "--model", "y"])
    ladder2 = a2.ladder or ("lambda" if a2.sampler == "dpmpp" else "t")
    assert ladder2 == "t"
    a3 = p.parse_args(["--input-h5", "x", "--model", "y",
                       "--sampler", "dpmpp", "--ladder", "t"])
    assert (a3.ladder or "lambda") == "t"


def test_infer_cli_avg_seeds_lambda_plot(workdir, dataset, checkpoint):
    """gw-infer with the measured-best recipe flags (--ladder lambda,
    --avg-seeds, --plot) runs end-to-end and emits plot + metrics."""
    out = os.path.join(workdir, "infer_avg")
    cli_infer.main([
        "--input-h5", dataset, "--index", "0", "--model", checkpoint,
        "--outdir", out, "--steps", "4", "--ladder", "lambda",
        "--avg-seeds", "3", "--plot", "--run-tag", "avg"])
    with open(os.path.join(out, "metrics_avg.json")) as fh:
        m = json.load(fh)
    assert np.isfinite(m["strain"]["corr_last"])
    assert os.path.exists(os.path.join(out, "overlay_avg.png"))
    # seed-scatter uncertainty artifacts (extension)
    assert m["seed_spread"]["n_seeds"] == 3
    assert m["seed_spread"]["strain_rms"] > 0
    assert os.path.exists(os.path.join(out, "recon_spread_avg.npy"))


def test_sweep_validation_gate_rejects_losing_combo(workdir, dataset,
                                                    checkpoint, monkeypatch):
    """A swept combo that loses to reference-default knobs on held-out
    samples must NOT be emitted in best_cmd.txt (VERDICT r2 item 4: round-2
    measured 4-sample sweep knobs scoring 0.539 vs 0.73 for defaults)."""
    import jax

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals import sweep as S
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import load_model

    model, params, schedule, ck = load_model(checkpoint)
    out = os.path.join(workdir, "sweep_gate")
    args = __import__(
        "diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.sweep",
        fromlist=["build_parser"]).build_parser().parse_args([
            "--input-h5", dataset, "--indices", "0", "--model", checkpoint,
            "--outdir", out, "--whiten", "1", "--whiten-mode", "model",
            "--sigma-mode", "std", "--val-samples", "2"])
    args.sigma_fixed = 1.0

    # stub scorer: the overfit "top" combo scores 0 out of sample, the
    # reference-default knobs score 1
    def fake_eval(model, params, schedule, ck, preps, combo, steps, key,
                  sampler="ddim", ladder="t", start_t_override=None, **kw):
        is_default = combo.cfg_scale == 1.5 and combo.init_mode == "noise" \
            and start_t_override is not None
        return {"combo": combo.to_dict(), "steps": steps,
                "J": 1.0 if is_default else 0.0, "J_std": 0.0,
                "per_sample": []}

    monkeypatch.setattr(S, "eval_combo", fake_eval)
    top = {"combo": S.Combo(start_snr=8.0, cfg_scale=2.5, init_mode="y-blend",
                            dc_weight=0.1, eta=0.25).to_dict(), "J": 0.99}
    val = S._emit_best_cmd(args, model, params, schedule, ck, top, 4,
                           jax.random.PRNGKey(0))
    assert val["enabled"] and not val["emit_top"]
    with open(os.path.join(out, "best_cmd.txt")) as fh:
        cmd = fh.read()
    # shipped command is the DEFAULT-knob command, not the losing combo
    assert f"--start-t {schedule.T - 1}" in cmd
    assert "--cfg-scale 1.5" in cmd and "y-blend" not in cmd
    with open(os.path.join(out, "validation.json")) as fh:
        v = json.load(fh)
    assert v["J_val_default"] > v["J_val_top"]

    # and a WINNING combo is emitted unchanged
    def fake_eval_win(model, params, schedule, ck, preps, combo, steps, key,
                      sampler="ddim", ladder="t", start_t_override=None, **kw):
        return {"combo": combo.to_dict(), "steps": steps,
                "J": 0.2 if start_t_override is not None else 0.9,
                "J_std": 0.0, "per_sample": []}

    monkeypatch.setattr(S, "eval_combo", fake_eval_win)
    val = S._emit_best_cmd(args, model, params, schedule, ck, top, 4,
                           jax.random.PRNGKey(0))
    assert val["emit_top"]
    with open(os.path.join(out, "best_cmd.txt")) as fh:
        cmd = fh.read()
    assert "y-blend" in cmd and "--cfg-scale 2.5" in cmd


def test_gen_batched_welch_matches_scipy(dataset):
    """The batched JAX Welch path in gw-gen must store PSDs matching a
    direct scipy recompute on the saved noisy strain (f64, same params)."""
    import h5py
    from scipy.signal import welch as scipy_welch

    with h5py.File(dataset, "r") as f:
        y = np.asarray(f["noisy"][0], np.float64)
        P_stored = np.asarray(f["psd_welch"][0], np.float64)
        fs = float(f.attrs["sampling_rate"])
    f_w, P_ref = scipy_welch(y, fs=fs, nperseg=min(4096, len(y)))
    assert P_stored.shape == P_ref.shape
    # relative agreement on the in-band PSD (both ~1e-46 scale)
    band = (f_w > 25.0) & (f_w < 1500.0)
    rel = np.abs(P_stored[band] - P_ref[band]) / P_ref[band]
    assert np.median(rel) < 5e-3 and rel.max() < 5e-2


def test_grid_cli_checkpoint_ensemble(workdir, dataset, checkpoint):
    """gw-grid --model a,b ensembles checkpoints: a self-ensemble (same
    checkpoint twice, shared sampling key) must reproduce the single-model
    metrics exactly."""
    out1 = os.path.join(workdir, "grid_solo")
    out2 = os.path.join(workdir, "grid_ens")
    common = ["--input-h5", dataset, "--outdir", None, "--steps", "4",
              "--per-cell", "1", "--min-per-cell", "1", "--start-t", "999"]
    a = list(common); a[3] = out1
    cli_grid.main(["--model", checkpoint] + a)
    b = list(common); b[3] = out2
    cli_grid.main(["--model", f"{checkpoint},{checkpoint}"] + b)
    with open(os.path.join(out1, "summary.json")) as fh:
        s1 = json.load(fh)
    with open(os.path.join(out2, "summary.json")) as fh:
        s2 = json.load(fh)
    assert abs(s1["corr_macro_mean"] - s2["corr_macro_mean"]) < 1e-6
    # --start-t 999 is clipped to the checkpoint's T-1 and recorded
    assert s2["start_t_resolved"] == s1["start_t_resolved"]
    assert s2["start_t_resolved"] is not None
    assert s2["start_t_resolved"] >= 1
