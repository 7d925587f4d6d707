"""Pallas kernel correctness vs XLA references (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.pallas import (
    flash_attention,
    flash_attention_reference,
)


@pytest.mark.parametrize("L,D,blk", [(256, 64, 128), (512, 32, 256)])
def test_flash_attention_matches_reference(L, D, blk):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    B, H = 2, 2
    q = jax.random.normal(kq, (B, H, L, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, L, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, L, D), jnp.float32)
    ref = flash_attention_reference(q, k, v)
    out = flash_attention(q, k, v, blk_q=blk, blk_k=blk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_flash_attention_rejects_ragged():
    q = jnp.zeros((1, 1, 300, 32))
    with pytest.raises(ValueError):
        flash_attention(q, q, q, blk_q=128, blk_k=128, interpret=True)


def test_unet_pallas_path_matches_plain():
    """UNet1D(use_pallas=True) == UNet1D(use_pallas=False) with the SAME
    params (identical pytree layout is part of the contract)."""
    from jax.experimental.pallas import tpu as pltpu

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models.unet import (
        UNet1D,
    )

    kw = dict(in_ch=7, base_ch=16, time_dim=32, depth=2, cond_in_ch=5,
              use_selfcond=True, use_attention=True)
    plain = UNet1D(use_pallas=False, **kw)
    fused = UNet1D(use_pallas=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 1024))
    t = jnp.array([3, 7], jnp.int32)
    params = plain.init(jax.random.PRNGKey(1), x, t)
    # same pytree structure -> params interchangeable
    y_plain = plain.apply(params, x, t)
    with pltpu.force_tpu_interpret_mode():
        y_fused = fused.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("B,L,Cin,Cout,g", [(2, 256, 24, 32, 8),
                                            (1, 128, 7, 16, 8)])
def test_fused_conv_gn_silu_matches_reference(B, L, Cin, Cout, g):
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.pallas.fused import (
        fused_conv_gn_silu,
        fused_conv_gn_silu_reference,
    )

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(ks[0], (B, L, Cin), jnp.float32)
    W = jax.random.normal(ks[1], (3, Cin, Cout)) * 0.1
    b = jax.random.normal(ks[2], (Cout,)) * 0.1
    s = jnp.ones(Cout) * 1.1
    bb = jnp.ones(Cout) * 0.05
    ref = fused_conv_gn_silu_reference(x, W, b, s, bb, g)
    out = fused_conv_gn_silu(x, W, b, s, bb, g, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
