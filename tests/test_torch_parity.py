"""BASELINE parity gate: this framework vs the reference PyTorch model.

Runs the reference ``UNet1D``/``CustomDiffusion`` (imported from
``/root/reference`` as a read-only ORACLE — the graded code never depends on
it) against our flax model with IDENTICAL weights and inputs.  Parity must
hold to <=1e-4 relative (BASELINE.json gate).

RNG streams differ between torch and JAX, so parity is defined on INJECTED
noise (SURVEY.md §7 'hard parts'): the same eps/t arrays feed both sides.

Skipped automatically when torch or the reference checkout is unavailable.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/src/snr_denoising"
import os

if not os.path.isdir(REF):
    pytest.skip("reference checkout unavailable", allow_module_level=True)
sys.path.insert(0, REF)

import jax
import jax.numpy as jnp
from models import CustomDiffusion as TorchDiffusion  # noqa: E402 (oracle)
from models import UNet1D as TorchUNet  # noqa: E402 (oracle)
from models import cosine_beta_schedule as torch_cosine  # noqa: E402

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models.unet import (
    UNet1D,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.diffusion import (
    q_sample_with_eps,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.schedules import (
    make_schedule,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.utils.torch_compat import (
    torch_state_dict_to_flax,
)


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)


def test_cosine_schedule_parity():
    T = 1000
    ours = np.asarray(make_schedule(T, "cosine").betas, np.float64)
    ref = torch_cosine(T).double().numpy()
    assert _rel_err(ours, ref) < 1e-4


def test_q_sample_parity_injected_noise():
    """The reference's q_sample draws its own eps (``models.py:52-59``), so
    parity is checked with injected noise through the same algebra using the
    reference's own alpha_bar tensor."""
    T = 100
    sched = make_schedule(T, "cosine")
    td = TorchDiffusion(T=T)
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 1, 256)).astype(np.float32)
    eps = rng.normal(size=(4, 1, 256)).astype(np.float32)
    t = np.array([0, 10, 50, 99])

    ab = td.alpha_bar.double().numpy()[t].reshape(-1, 1, 1)
    x_t_ref = np.sqrt(ab) * x0 + np.sqrt(1.0 - ab) * eps
    x_t_ours = np.asarray(q_sample_with_eps(sched, jnp.asarray(x0),
                                            jnp.asarray(t), jnp.asarray(eps)))
    assert _rel_err(x_t_ours, x_t_ref) < 1e-4


@pytest.mark.parametrize("in_ch,cond_in_ch,selfcond,L", [
    (3, 1, True, 512),       # legacy layout
    (7, 5, True, 1024),      # y + 4 metadata channels + selfcond
    (1, 0, False, 384),      # unconditional, non-pow2 length
])
def test_unet_forward_parity(in_ch, cond_in_ch, selfcond, L):
    torch.manual_seed(0)
    depth, base_ch, time_dim = 3, 32, 64
    tnet = TorchUNet(in_ch=in_ch, base_ch=base_ch, time_dim=time_dim,
                     depth=depth, cond_in_ch=cond_in_ch,
                     use_selfcond=selfcond).eval()
    sd = {k: v.detach().numpy().copy() for k, v in tnet.state_dict().items()}
    # both sides zero-init the final head; perturb it so the comparison
    # exercises the whole decoder path, not just zeros
    rng = np.random.default_rng(1)
    sd["final.weight"] = rng.normal(
        size=sd["final.weight"].shape).astype(np.float32) * 0.1
    sd["final.bias"] = rng.normal(
        size=sd["final.bias"].shape).astype(np.float32) * 0.1
    tnet.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    params = torch_state_dict_to_flax(sd, depth)

    jnet = UNet1D(in_ch=in_ch, base_ch=base_ch, time_dim=time_dim,
                  depth=depth, cond_in_ch=cond_in_ch, use_selfcond=selfcond)

    x = rng.normal(size=(2, in_ch, L)).astype(np.float32)
    t = np.array([17, 500])

    with torch.no_grad():
        y_ref = tnet(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    y_ours = np.asarray(jnet.apply(params, jnp.asarray(x), jnp.asarray(t)))

    assert y_ours.shape == y_ref.shape
    assert np.abs(y_ref).max() > 0
    assert _rel_err(y_ours, y_ref) < 1e-4, _rel_err(y_ours, y_ref)


def test_ddim_sampler_parity_mock_model():
    """DDIM reverse-process algebra (t schedule, CFG weights/shortcuts,
    eps->x0, dc blend, update rule) vs the reference sampler with a shared
    DETERMINISTIC mock model and a shared deterministic init (dc_weight>0
    with init injected through oracle clean), eta=0."""
    import inference as ref_inf  # reference module (oracle)

    T, steps, L = 200, 25, 256
    sched = make_schedule(T, "cosine")
    td = TorchDiffusion(T=T)

    # deterministic mock: eps_hat = 0.2 * x_t + 0.1 * y  (uses cond channel)
    class MockTorch(torch.nn.Module):
        def forward(self, net_in, t):
            x_t = net_in[:, :1, :]
            y = net_in[:, 1:2, :]
            return 0.2 * x_t + 0.1 * y

    def mock_jax(params, net_in, t):
        x_t = net_in[:, :1, :]
        y = net_in[:, 1:2, :]
        return 0.2 * x_t + 0.1 * y

    rng = np.random.default_rng(3)
    y = rng.normal(size=(1, 1, L)).astype(np.float32)
    clean = rng.normal(size=(1, 1, L)).astype(np.float32)
    cond = y

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        SamplerConfig,
        ddim_sample,
    )

    for cfg_mode, cfg_scale, dc in [("const", 1.5, 0.0), ("gauss", 2.0, 0.1),
                                    ("tophat", 1.8, 0.0), ("const", 1.0, 0.0)]:
        # reference run: oracle init makes x_T deterministic given clean...
        # but q_sample draws noise; instead start from start_t=T-1 with
        # init y-blend and zero noise by monkeypatching torch.randn
        orig_randn = torch.randn
        torch.randn = lambda *a, **k: torch.zeros(*a, **{kk: vv for kk, vv in k.items() if kk != "generator"})
        try:
            x_ref = ref_inf.ddim_sample(
                MockTorch(), td, torch.from_numpy(cond), T=T, steps=steps,
                eta=0.0, device=torch.device("cpu"), length=L, debug=False,
                start_t=None, init_mode="y-blend", x0_std_est=0.14,
                dc_weight=dc, cond_scale=1.0, eps_scale=1.0, pred_type="eps",
                in_ch=3, cond_in_ch=1, use_selfcond=True,
                cfg_scale=cfg_scale, cfg_mode=cfg_mode, cfg_center=0.7,
                cfg_width=0.12, cfg_u_only_thresh=0.05).numpy()
        finally:
            torch.randn = orig_randn

        # our run: same deterministic init via a zero-noise key path -> use
        # init_mode="y-blend" whose noise comes from jax PRNG; inject zeros
        # by running with a patched normal
        import diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling as S

        orig_normal = jax.random.normal
        jax.random.normal = lambda key, shape, dtype=jnp.float32: jnp.zeros(
            shape, dtype)
        try:
            # clamp_inputs / x0_clip are OUR stabilisation (the reference
            # has none) — disable for raw-algebra parity
            cfg = SamplerConfig(steps=steps, eta=0.0, init_mode="y-blend",
                                dc_weight=dc, cfg_scale=cfg_scale,
                                cfg_mode=cfg_mode, cfg_center=0.7,
                                cfg_width=0.12, use_selfcond=True,
                                clamp_inputs=0.0, x0_clip=0.0)
            x_ours = np.asarray(ddim_sample(mock_jax, {}, sched,
                                            jnp.asarray(cond),
                                            jax.random.PRNGKey(0), cfg))
        finally:
            jax.random.normal = orig_normal

        err = _rel_err(x_ours, x_ref)
        assert err < 1e-4, (cfg_mode, cfg_scale, dc, err)


def test_load_model_from_torch_pth(tmp_path):
    """A reference-format .pth checkpoint (train.py:607-629 payload) loads
    directly through our inference.load_model with forward parity."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
        load_model,
    )

    torch.manual_seed(1)
    depth = 2
    # the reference builds with t_embed_max_time = T-1 at train AND
    # inference (train.py:250, inference.py:635)
    tnet = TorchUNet(in_ch=3, base_ch=16, time_dim=32, depth=depth,
                     cond_in_ch=1, use_selfcond=True,
                     t_embed_max_time=99).eval()
    sd = {k: v.detach().numpy().copy() for k, v in tnet.state_dict().items()}
    rng = np.random.default_rng(5)
    sd["final.weight"] = rng.normal(
        size=sd["final.weight"].shape).astype(np.float32) * 0.1
    sd["final.bias"] = rng.normal(
        size=sd["final.bias"].shape).astype(np.float32) * 0.1
    tnet.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    payload = {
        "model_state": tnet.state_dict(),
        "model_ema_state": tnet.state_dict(),
        "epoch": 50,
        "args": {"in_ch": 3, "cond_in_ch": 1, "base_ch": 16, "time_dim": 32,
                 "depth": depth, "T": 100, "whiten": True,
                 "whiten_mode": "model", "sigma_mode": "std",
                 "meta_scale": {"M": 60.0, "q": 5.0}},
    }
    path = str(tmp_path / "ref_ckpt.pth")
    torch.save(payload, path)

    model, params, schedule, ck = load_model(path)
    assert schedule.T == 100
    assert ck["meta_scale"]["M"] == 60.0

    x = rng.normal(size=(1, 3, 512)).astype(np.float32)
    t = np.array([42])
    with torch.no_grad():
        y_ref = tnet(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    y_ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t)))
    assert _rel_err(y_ours, y_ref) < 1e-4


@pytest.mark.parametrize("L_in,L_out", [(512, 300), (300, 512), (512, 256),
                                        (4096, 1024),
                                        # odd integer factors (3, 5) must
                                        # take the general gather path
                                        (768, 256), (1280, 256)])
def test_resize_linear_matches_torch_interpolate(L_in, L_out):
    """_resize_linear (both fast and gather paths) vs torch F.interpolate."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models.unet import (
        _resize_linear,
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, L_in)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=L_out, mode="linear",
        align_corners=False).numpy()
    ours = np.asarray(_resize_linear(
        jnp.asarray(x.transpose(0, 2, 1)), L_out)).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_composed_training_loss_parity(tmp_path):
    """VERDICT r1 item 2: END-TO-END fixed-seed loss-curve parity.

    Runs the reference trainer (``train.py:174-630``) for 20 real optimizer
    steps — its own dataloader, sigma-normalisation, conditioning stack,
    clamping, q_sample, masked Huber loss, grad clip, AdamW, warmup+cosine
    LR and EMA — against this framework's ``make_train_step`` with IDENTICAL
    initial weights and IDENTICAL injected (t, eps).

    Determinism strategy (both sides):
      * one batch per epoch (dataset size == batch size) so the reference's
        shuffle only permutes WITHIN the batch;
      * t is constant across the batch (varies per step) and eps is a fixed
        deterministic function of the (clamped, sigma-normalised) clean
        signal, so the composed loss is permutation-invariant;
      * p_uncond = p_selfcond = 0 removes the remaining RNG draws.

    This is the composition gate on top of the component parity tests above:
    loss reduction x masking x clamping x conditioning order x optimizer
    math must agree <=1e-4 relative per step for all 20 steps.  (AdamW,
    grad-clip and LR-schedule math agree exactly between optax and torch up
    to f32 rounding; torch's clip_grad_norm_ adds 1e-6 to the denominator —
    ~1e-6 relative on clipped steps, far inside the gate.)
    """
    import json as _json
    import types

    import models as ref_models  # reference module (oracle)
    import train as ref_train  # reference module (oracle)

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli import (
        gen as cli_gen,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import (
        pipeline as dpipe,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.hdf5io import (
        compute_meta_scale,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig,
        TrainState,
        build_model_and_state,
        make_train_step,
    )

    T, B, n_steps = 100, 8, 20
    t_seq = [(3 + 17 * k) % T for k in range(n_steps)]

    # --- shared tiny dataset (one batch worth of samples) ----------------
    h5 = str(tmp_path / "tiny.h5")
    cli_gen.main([
        "--mode", "fixed", "--num-samples", str(B), "--output-path", h5,
        "--mass1", "38", "--mass2", "33", "--snr", "18",
        "--sampling-rate", "1024", "--seed", "11"])

    # --- shared initial weights (reference-format .pth) ------------------
    torch.manual_seed(2)
    cond_in_ch, in_ch, base_ch, time_dim, depth = 5, 7, 16, 32, 2
    tnet = TorchUNet(in_ch=in_ch, base_ch=base_ch, time_dim=time_dim,
                     depth=depth, cond_in_ch=cond_in_ch, use_selfcond=True,
                     t_embed_max_time=T - 1)
    sd = {k: v.detach().numpy().copy() for k, v in tnet.state_dict().items()}
    rng = np.random.default_rng(4)
    for k in ("final.weight", "final.bias"):  # zero-init otherwise
        sd[k] = rng.normal(size=sd[k].shape).astype(np.float32) * 0.05
    tnet.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    init_pth = str(tmp_path / "init.pth")
    torch.save({"model_state": tnet.state_dict(), "epoch": 0,
                "args": {"in_ch": in_ch, "cond_in_ch": cond_in_ch,
                         "base_ch": base_ch, "time_dim": time_dim,
                         "depth": depth, "T": T}}, init_pth)

    def eps_of_x0_np(x0):
        return (np.cos(7.0 * x0) + 0.1 * np.roll(x0, 5, axis=-1)
                ).astype(np.float32)

    # --- reference run: REAL train_diffusion with patched RNG ------------
    ref_jsonl = str(tmp_path / "ref_log.jsonl")
    args = types.SimpleNamespace(
        data=h5, model_dir=str(tmp_path / "ref_out"), epochs=n_steps,
        batch_size=B, lr=2e-4, weight_decay=1e-4, T=T, base_ch=base_ch,
        time_dim=time_dim, depth=depth, device="cpu", num_workers=0, seed=0,
        p_uncond=0.0, p_selfcond=0.0, t_min_frac=0.0, force_cond_epochs=0,
        t_cover="rand", t_bins=0, t_multi=1, loss="huber", huber_beta=0.5,
        clip_grad=1.0, clamp_inputs=10.0, skip_bad_batches=True,
        skip_loss_threshold=50.0, debug_first=False, debug_first_every=0,
        log_jsonl=ref_jsonl, probe_cond=False, probe_t=[], probe_interval=50,
        amp=False, ema=True, ema_decay=0.999, warmup_steps=5,
        cosine_decay=True, min_lr_scale=0.1, loss_weight_power=0.0,
        whiten=False, whiten_mode="auto", sigma_mode="std", sigma_fixed=1.0,
        init_from=init_pth, dropout_y_only=True,
    )

    calls = [0]

    def fake_randint(low, high, size, **kw):
        v = t_seq[calls[0] % n_steps]
        calls[0] += 1
        return torch.full(size, v, dtype=torch.long,
                          device=kw.get("device", "cpu"))

    def patched_q_sample(self, x0, t):
        t = t.long()
        a = self.alpha_bar.sqrt()[t].view(-1, 1, 1)
        m = (1 - self.alpha_bar).sqrt()[t].view(-1, 1, 1)
        eps = torch.from_numpy(eps_of_x0_np(x0.numpy()))
        return a * x0 + m * eps, eps

    orig_randint = torch.randint
    orig_q = ref_models.CustomDiffusion.q_sample
    torch.randint = fake_randint
    ref_models.CustomDiffusion.q_sample = patched_q_sample
    try:
        ref_train.train_diffusion(args)
    finally:
        torch.randint = orig_randint
        ref_models.CustomDiffusion.q_sample = orig_q

    ref_losses = []
    with open(ref_jsonl) as fh:
        for line in fh:
            rec = _json.loads(line)
            if rec.get("phase") == "train_batch":
                ref_losses.append(rec["loss"])
    assert len(ref_losses) == n_steps

    # --- our run: make_train_step with injected (t, eps) -----------------
    meta_scale = compute_meta_scale(h5)
    ds = dpipe.prepare_dataset(h5, whiten=False, sigma_mode="std",
                               include_metadata=True,
                               mass_scale=meta_scale.get("M", 80.0))
    cfg = TrainConfig(
        data=h5, model_dir=str(tmp_path / "our_out"), epochs=n_steps,
        batch_size=B, lr=2e-4, weight_decay=1e-4, T=T, base_ch=base_ch,
        time_dim=time_dim, depth=depth, seed=0, p_uncond=0.0, p_selfcond=0.0,
        t_min_frac=0.0, t_cover="rand", loss="huber", huber_beta=0.5,
        clip_grad=1.0, clamp_inputs=10.0, warmup_steps=5, cosine_decay=True,
        min_lr_scale=0.1, ema=True, ema_decay=0.999, bf16=False,
        data_parallel=False, init_from=init_pth,
    )
    L = ds.bucket_lengths[0]
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        make_optimizer,
    )

    key = jax.random.PRNGKey(0)
    model, schedule, optimizer, lr_sched, state, (in_ch2, cond2) = (
        build_model_and_state(cfg, c_meta=4, example_len=L,
                              total_steps=n_steps, key=key))
    assert (in_ch2, cond2) == (in_ch, cond_in_ch)
    step_fn = make_train_step(model, schedule, cfg, optimizer, lr_sched)

    jb = next(dpipe.iterate_batches(ds, B, np.random.default_rng(0)))
    clean = np.asarray(jb["clean"], np.float32)
    sigma = np.asarray(jb["sigma"], np.float32).reshape(-1, 1, 1)
    clean_norm = np.clip(clean / sigma, -10.0, 10.0)
    eps_inj = eps_of_x0_np(clean_norm)

    our_losses = []
    for k in range(n_steps):
        b = dict(jb)
        b["t_inject"] = jnp.full((B,), t_seq[k], jnp.int32)
        b["eps_inject"] = jnp.asarray(eps_inj)
        state, m = step_fn(state, b, jax.random.PRNGKey(k + 1),
                           jnp.asarray(0), jnp.asarray(0.0), jnp.asarray(0.0))
        our_losses.append(float(m["loss"]))

    ref_l = np.asarray(ref_losses, np.float64)
    our_l = np.asarray(our_losses, np.float64)
    rel = np.abs(our_l - ref_l) / (np.abs(ref_l) + 1e-30)
    assert rel.max() < 1e-4, (list(zip(t_seq, ref_l, our_l)), rel.max())


def test_full_trajectory_reconstruction_and_mf_snr_parity(tmp_path):
    """BASELINE gate, final clause (VERDICT r2 item 2/3): run the REFERENCE
    ``ddim_sample`` (inference.py:374-514) end-to-end on a real .pth
    checkpoint against our scan-based sampler with INJECTED noise (shared
    init and per-step eta-noise via patched RNGs), and assert <=1e-4
    relative agreement on the full reconstructed waveform AND on the
    recovered matched-filter SNR.
    """
    import inference as ref_inf  # reference module (oracle)

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.synth import (
        aligo_zdhp_psd,
        matched_filter_sigma,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
        load_model,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        SamplerConfig,
        ddim_sample,
    )

    T, steps, L = 100, 50, 512

    # --- real reference-format checkpoint (random but REAL weights) -------
    torch.manual_seed(7)
    tnet = TorchUNet(in_ch=3, base_ch=16, time_dim=32, depth=2,
                     cond_in_ch=1, use_selfcond=True,
                     t_embed_max_time=T - 1).eval()
    sd = tnet.state_dict()
    rng = np.random.default_rng(11)
    # the reference zero-inits the head (models.py:131-134) -> replace so the
    # sampler trajectory is non-trivial
    sd["final.weight"] = torch.from_numpy(
        rng.normal(size=sd["final.weight"].shape).astype(np.float32) * 0.05)
    sd["final.bias"] = torch.from_numpy(
        rng.normal(size=sd["final.bias"].shape).astype(np.float32) * 0.05)
    tnet.load_state_dict(sd)
    payload = {
        "model_state": tnet.state_dict(),
        "epoch": 1,
        "args": {"in_ch": 3, "cond_in_ch": 1, "base_ch": 16, "time_dim": 32,
                 "depth": 2, "T": T, "whiten": True, "whiten_mode": "model",
                 "sigma_mode": "std", "meta_scale": {"M": 80.0, "q": 10.0}},
    }
    path = str(tmp_path / "gate_ckpt.pth")
    torch.save(payload, path)
    model, params, schedule, ck = load_model(path)

    td = TorchDiffusion(T=T)
    y = rng.normal(size=(1, 1, L)).astype(np.float32) * 0.5
    cond = y

    # --- injected noise: one fixed field per shape, shared by BOTH RNGs ---
    noise_bank = {}

    def _z(shape):
        key = tuple(shape)
        if key not in noise_bank:
            noise_bank[key] = np.random.default_rng(
                1234 + len(noise_bank)).normal(size=shape).astype(np.float32)
        return noise_bank[key]

    eta, cfg_scale, dc = 0.25, 1.5, 0.05

    orig_randn = torch.randn
    orig_randn_like = torch.randn_like
    torch.randn = lambda *a, **k: torch.from_numpy(
        _z(tuple(a[0]) if isinstance(a[0], (tuple, torch.Size)) else a))
    torch.randn_like = lambda x, **k: torch.from_numpy(_z(tuple(x.shape)))
    try:
        x_ref = ref_inf.ddim_sample(
            tnet, td, torch.from_numpy(cond), T=T, steps=steps,
            eta=eta, device=torch.device("cpu"), length=L, debug=False,
            start_t=None, init_mode="scaled-noise", x0_std_est=0.2,
            dc_weight=dc, cond_scale=1.0, eps_scale=1.0, pred_type="eps",
            in_ch=3, cond_in_ch=1, use_selfcond=True,
            cfg_scale=cfg_scale, cfg_mode="const", cfg_center=0.7,
            cfg_width=0.12, cfg_u_only_thresh=0.05).numpy()
    finally:
        torch.randn = orig_randn
        torch.randn_like = orig_randn_like

    orig_normal = jax.random.normal
    jax.random.normal = lambda key, shape, dtype=jnp.float32: jnp.asarray(
        _z(tuple(shape)))
    try:
        cfg = SamplerConfig(steps=steps, eta=eta, init_mode="scaled-noise",
                            x0_std_est=0.2, dc_weight=dc,
                            cfg_scale=cfg_scale, cfg_mode="const",
                            cfg_center=0.7, cfg_width=0.12,
                            use_selfcond=True, clamp_inputs=0.0, x0_clip=0.0)
        x_ours = np.asarray(ddim_sample(model.apply, params, schedule,
                                        jnp.asarray(cond),
                                        jax.random.PRNGKey(0), cfg))
    finally:
        jax.random.normal = orig_normal

    # full-waveform parity
    err = _rel_err(x_ours, x_ref)
    assert err < 1e-4, err

    # matched-filter SNR parity through the SAME physical MF functional
    fs = 4096.0
    freqs = np.fft.rfftfreq(L, 1.0 / fs)
    psd = np.asarray(aligo_zdhp_psd(jnp.asarray(freqs), 20.0))
    # the recon lives in the sigma-normalised O(1) domain; treat it as
    # strain x STRAIN_SCALE so the scaled-units MF arithmetic stays in
    # f32 range (data/synth.py convention)
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.synth import (
        STRAIN_SCALE,
    )
    snr_ref = float(matched_filter_sigma(
        jnp.asarray(x_ref[0, 0]), jnp.asarray(psd), fs, 20.0,
        signal_scale=STRAIN_SCALE))
    snr_ours = float(matched_filter_sigma(
        jnp.asarray(x_ours[0, 0]), jnp.asarray(psd), fs, 20.0,
        signal_scale=STRAIN_SCALE))
    assert abs(snr_ours - snr_ref) / max(abs(snr_ref), 1e-30) < 1e-4
