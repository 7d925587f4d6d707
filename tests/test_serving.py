"""AOT serving export (serving.py + gw-export / gw-serve CLIs).

Framework extension — no reference counterpart (the reference serves by
re-running its Python/torch inference script, ``inference.py:517-903``).
Covers: exported-artifact round-trip equivalence with the live jitted
sampler, parity of the serving core with ``reconstruct_batch`` (the CLI
path users already trust), distilled-checkpoint knob resolution, the
serving-specific start_t default, sidecar contract contents, the export
CLI, arbitrary-n request chunking (``run_batched``), and the ``gw-serve``
batch + HTTP modes.
"""
import io
import json
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.export import (
    main as export_main,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
    load_model,
    reconstruct_batch,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models import UNet1D
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.schedules import (
    make_schedule,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.serve import (
    main as serve_main,
    make_server,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.serving import (
    build_serving_fn,
    export_sampler,
    load_exported,
    resolve_serving_config,
    run_batched,
    validate_export,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.utils.checkpoint import (
    save_checkpoint,
)

B, C, L, T = 2, 5, 256, 50
ARGS = {"base_ch": 8, "in_ch": 7, "cond_in_ch": C, "T": T,
        "schedule": "cosine", "pred_type": "v", "time_dim": 16, "depth": 2,
        "whiten": 1, "whiten_mode": "model", "sigma_mode": "std",
        "meta_scale": {"M": 80.0, "q": 10.0}, "fs": 2048.0}


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    model = UNet1D(in_ch=7, base_ch=8, time_dim=16, depth=2,
                   t_embed_max_time=float(T - 1), cond_in_ch=C,
                   use_selfcond=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 64)),
                        jnp.zeros((1,), jnp.int32))
    path = str(d / "model.msgpack")
    save_checkpoint(path, params, dict(ARGS), epoch=1)
    return path


def _inputs(seed=3):
    rng = np.random.default_rng(seed)
    cond = rng.normal(size=(B, C, L)).astype(np.float32)
    sig = rng.uniform(0.5, 2.0, B).astype(np.float32)
    return cond, sig


def test_export_roundtrip_matches_live(tiny_ckpt, tmp_path):
    """Deserialized artifact == live jitted serving fn, bit-exact (same
    program, same platform)."""
    out = str(tmp_path / "sampler.shlo")
    export_sampler(tiny_ckpt, out, batch=B, length=L, platforms=["cpu"],
                   steps=6, avg_seeds=2, amp_calib="mf")
    call, contract = load_exported(out)
    model, params, schedule, ck = load_model(tiny_ckpt)
    cfg, sampler = resolve_serving_config(ck, schedule, steps=6)
    fn = build_serving_fn(model, schedule, cfg, sampler=sampler,
                          avg_seeds=2, amp_calib="mf")
    cond, sig = _inputs()
    got = np.asarray(call(cond, sig, np.int32(7)))
    want = np.asarray(jax.jit(lambda c, s, k: fn(params, c, s, k))(
        cond, sig, jnp.int32(7)))
    assert got.shape == (B, L)
    np.testing.assert_array_equal(got, want)
    assert contract["knobs"]["steps"] == 6
    assert contract["knobs"]["amp_calib"] == "mf"
    assert contract["arch"]["base_ch"] == 8


def test_serving_core_matches_reconstruct_batch(tiny_ckpt):
    """The serving fn reproduces reconstruct_batch (the trusted CLI path):
    exact in normalized domain; MF amp calib differs only by f64-vs-f32
    roundoff."""
    model, params, schedule, ck = load_model(tiny_ckpt)
    cfg, sampler = resolve_serving_config(ck, schedule, steps=5)
    cond, sig = _inputs(4)
    seed = 11
    for avg_seeds, amp, tol in [(1, "none", 0.0), (2, "mf", 1e-4)]:
        fn = build_serving_fn(model, schedule, cfg, sampler=sampler,
                              avg_seeds=avg_seeds, amp_calib=amp)
        got = np.asarray(fn(params, cond, sig, jnp.int32(seed)))
        want = reconstruct_batch(model, params, schedule, cond, sig, cfg,
                                 jax.random.PRNGKey(seed),
                                 avg_seeds=avg_seeds, amp_calib=amp)
        if tol == 0.0:
            np.testing.assert_array_equal(got, want)
        else:
            np.testing.assert_allclose(got, want, rtol=tol, atol=1e-6)


def test_distilled_knob_resolution(tiny_ckpt):
    """A distilled checkpoint's deployment contract wins over reference
    defaults; explicit overrides win over both."""
    _, _, schedule, ck = load_model(tiny_ckpt)
    dck = dict(ck, distilled_steps=4, distilled_ladder="lambda",
               distilled_start_t=T - 1, selfcond_mode="zero")
    cfg, _ = resolve_serving_config(dck, schedule)
    assert cfg.steps == 4
    assert cfg.ladder == "lambda"
    assert cfg.cfg_scale == 1.0          # folded CFG: never re-applied
    assert cfg.selfcond_mode == "zero"
    cfg2, _ = resolve_serving_config(dck, schedule, steps=2, cfg_scale=1.3)
    assert cfg2.steps == 2 and cfg2.cfg_scale == 1.3
    # plain checkpoint: reference defaults + serving start_t = T-1 (noise
    # init from mid-chain is the measured footgun)
    cfg3, _ = resolve_serving_config(ck, schedule)
    assert cfg3.steps == 200 and cfg3.cfg_scale == 1.5
    assert int(cfg3.start_t) == T - 1


@pytest.fixture(scope="module")
def tiny_artifact(tiny_ckpt, tmp_path_factory):
    """One shared 4-step, avg_seeds=1 CPU artifact for the serve tests
    (export lowering is the slow part; reuse it)."""
    out = str(tmp_path_factory.mktemp("art") / "sampler.shlo")
    export_sampler(tiny_ckpt, out, batch=B, length=L, platforms=["cpu"],
                   steps=4, avg_seeds=1, amp_calib="mf")
    return out


def test_run_batched_chunks_and_pads(tiny_artifact):
    """Arbitrary-n requests against a static-batch artifact: chunk 0 is the
    direct call; the padded tail chunk reproduces a hand-padded call at the
    advanced seed; shape violations raise."""
    call, contract = load_exported(tiny_artifact)
    rng = np.random.default_rng(5)
    n = B + 1                                 # forces a padded tail chunk
    cond = rng.normal(size=(n, C, L)).astype(np.float32)
    sig = rng.uniform(0.5, 2.0, n).astype(np.float32)
    got = run_batched(call, contract, cond, sig, seed=9)
    assert got.shape == (n, L)
    want0 = np.asarray(call(cond[:B], sig[:B], np.int32(9)))
    np.testing.assert_array_equal(got[:B], want0)
    padc = np.concatenate([cond[B:], np.zeros((B - 1, C, L), np.float32)])
    pads = np.concatenate([sig[B:], np.ones((B - 1,), np.float32)])
    want1 = np.asarray(call(padc, pads, np.int32(10)))
    np.testing.assert_array_equal(got[B:], want1[:1])
    with pytest.raises(ValueError):
        run_batched(call, contract, cond[:, :, :L // 2], sig)
    with pytest.raises(ValueError):
        run_batched(call, contract, cond, sig[:1])


def test_serve_cli_batch_mode(tiny_artifact, tmp_path):
    req = str(tmp_path / "req.npz")
    resp = str(tmp_path / "resp.npz")
    cond, sig = _inputs(6)
    np.savez(req, cond_stack=cond, sigmas=sig)
    rc = serve_main(["--artifact", tiny_artifact, "--input", req,
                     "--output", resp, "--seed", "3"])
    assert rc == 0
    out = np.load(resp)
    call, contract = load_exported(tiny_artifact)
    want = run_batched(call, contract, cond, sig, seed=3)
    np.testing.assert_array_equal(out["x0_white"], want)
    assert int(out["seed"]) == 3


def test_serve_http_roundtrip(tiny_artifact):
    """POST /reconstruct == run_batched at the request seed; /contract
    serves the sidecar; junk payloads get a 400, not a dead server."""
    import http.client

    srv = make_server(tiny_artifact, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200 and r.read() == b"ok"
        conn.request("GET", "/contract")
        r = conn.getresponse()
        assert json.loads(r.read())["knobs"]["steps"] == 4
        cond, sig = _inputs(8)
        buf = io.BytesIO()
        np.savez(buf, cond_stack=cond, sigmas=sig, seed=np.int32(5))
        conn.request("POST", "/reconstruct", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 200
        out = np.load(io.BytesIO(r.read()))
        call, contract = load_exported(tiny_artifact)
        want = run_batched(call, contract, cond, sig, seed=5)
        np.testing.assert_array_equal(out["x0_white"], want)
        conn.request("POST", "/reconstruct", body=b"junk")
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        # server still alive after the bad request
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
    finally:
        srv.shutdown()
        srv.server_close()


def test_cli_e2e_and_validate(tiny_ckpt, tmp_path):
    out = str(tmp_path / "artifact.shlo")
    rc = export_main(["--model", tiny_ckpt, "--output", out,
                      "--batch-size", str(B), "--length", str(L),
                      "--platforms", "cpu", "--steps", "4",
                      "--avg-seeds", "1", "--validate"])
    assert rc == 0
    assert os.path.exists(out) and os.path.exists(out + ".json")
    with open(out + ".json") as fh:
        contract = json.load(fh)
    assert contract["calling_convention"]["inputs"]["cond_stack"] == [
        B, C, L, "float32"]
    assert validate_export(out) > 0.0


def test_sidecar_prep_block_and_version_gate(tiny_artifact, tmp_path):
    """ADVICE r3: the sidecar must carry the measurement-prep domain so an
    ingest host can run prepare_measurement from the contract alone, and
    load_exported must fail fast on a contract-generation mismatch."""
    _, contract = load_exported(tiny_artifact)
    prep = contract["prep"]
    assert prep["whiten"] is True
    assert prep["whiten_mode"] == "model"
    assert prep["sigma_mode"] == "std"
    assert prep["meta_scale"] == {"M": 80.0, "q": 10.0}
    assert prep["fs"] == 2048.0          # from checkpoint args, not default

    # future-generation sidecar -> hard error, not silent consumption
    import shutil
    art2 = str(tmp_path / "v2.shlo")
    shutil.copy(tiny_artifact, art2)
    bad = dict(contract, contract_version=999)
    with open(art2 + ".json", "w") as fh:
        json.dump(bad, fh)
    with pytest.raises(ValueError, match="contract_version"):
        load_exported(art2)


def test_serve_http_wrong_shape_is_400_server_alive(tiny_artifact):
    """A well-formed npz whose shapes violate the artifact contract is the
    client's 400 (run_batched ValueError path), and the server survives."""
    import http.client

    srv = make_server(tiny_artifact, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=120)
        cond, sig = _inputs(4)
        buf = io.BytesIO()
        np.savez(buf, cond_stack=cond[:, :, :L // 2], sigmas=sig)
        conn.request("POST", "/reconstruct", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
    finally:
        srv.shutdown()
        srv.server_close()


def test_export_dp_sharded_pod_artifact(tiny_ckpt, tmp_path):
    """Pod-serving export (``--dp``): the batch axis is sharded over a
    2-device 'data' mesh baked in via AbstractMesh at export time (no
    multi-device process needed to EXPORT); load_exported rebuilds the
    mesh on this 8-device CPU host and the sharded artifact reproduces
    the single-device artifact's output for identical inputs/seed.
    run_batched chunking works unchanged on top of the sharded call."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 local devices")
    B4 = 4
    art1 = str(tmp_path / "dp1.shlo")
    art2 = str(tmp_path / "dp2.shlo")
    export_sampler(tiny_ckpt, art1, batch=B4, length=L, platforms=["cpu"],
                   steps=4, avg_seeds=2, amp_calib="mf")
    export_sampler(tiny_ckpt, art2, batch=B4, length=L, platforms=["cpu"],
                   steps=4, avg_seeds=2, amp_calib="mf", dp=2)
    c1, k1 = load_exported(art1)
    c2, k2 = load_exported(art2)
    assert k1["dp"] == 1 and k2["dp"] == 2
    rng = np.random.default_rng(12)
    cond = rng.normal(size=(B4, C, L)).astype(np.float32)
    sig = rng.uniform(0.5, 2.0, B4).astype(np.float32)
    want = np.asarray(c1(cond, sig, np.int32(3)))
    got = np.asarray(c2(cond, sig, np.int32(3)))
    assert got.shape == (B4, L)
    # identical math; sharded cross-device reductions (per-seed mean) may
    # reassociate f32 sums
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # arbitrary-n serving on the pod artifact (chunk + pad on the host)
    n = B4 + 2
    condn = rng.normal(size=(n, C, L)).astype(np.float32)
    sign = rng.uniform(0.5, 2.0, n).astype(np.float32)
    out = run_batched(c2, k2, condn, sign, seed=5)
    assert out.shape == (n, L) and np.all(np.isfinite(out))

    # batch not divisible by dp is an export-time error
    with pytest.raises(ValueError, match="divisible"):
        export_sampler(tiny_ckpt, str(tmp_path / "bad.shlo"), batch=3,
                       length=L, platforms=["cpu"], steps=4, dp=2)
