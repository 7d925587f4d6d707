"""Shape/jit/semantics tests for the UNet1D denoiser."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models import (
    UNet1D,
    TimeEmbedding,
    build_net_input,
)


def _init_and_apply(model, x, t, key=0):
    params = model.init(jax.random.PRNGKey(key), x, t)
    out = model.apply(params, x, t)
    return params, out


def test_time_embedding_shape_and_values():
    emb = TimeEmbedding(dim=128, max_time=999.0)
    t = jnp.array([0, 500, 999])
    out = emb.apply({}, t)
    assert out.shape == (3, 128)
    o = np.asarray(out)
    # t=0 -> sin part all zero, cos part all one
    np.testing.assert_allclose(o[0, :64], 0.0, atol=1e-6)
    np.testing.assert_allclose(o[0, 64:], 1.0, atol=1e-6)
    # matches the reference formula directly
    import math
    half = 64
    freqs = np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1)))
    x = (500.0 / 999.0) * freqs
    np.testing.assert_allclose(o[1, :64], np.sin(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(o[1, 64:], np.cos(x), rtol=1e-5, atol=1e-6)


def test_time_embedding_odd_dim_zero_pad():
    emb = TimeEmbedding(dim=9)
    out = emb.apply({}, jnp.array([3]))
    assert out.shape == (1, 9)
    assert float(out[0, -1]) == 0.0


@pytest.mark.parametrize("depth,base_ch,L", [(2, 8, 64), (3, 16, 1024)])
def test_unet_shapes(depth, base_ch, L):
    in_ch = 7  # x_t + 5 cond + selfcond
    model = UNet1D(in_ch=in_ch, base_ch=base_ch, depth=depth, cond_in_ch=5,
                   use_selfcond=True)
    x = jnp.ones((2, in_ch, L))
    t = jnp.array([5, 10])
    _, out = _init_and_apply(model, x, t)
    assert out.shape == (2, 1, L)


def test_unet_legacy_in_ch3_inference():
    """in_ch=3 means [x_t, y, selfcond]: cond_in_ch inferred 1, selfcond True
    (ref models.py:74-77, 91-98)."""
    model = UNet1D(in_ch=3)
    use_sc, cond_ch = model._layout()
    assert use_sc is True and cond_ch == 1
    x = jnp.ones((1, 3, 128))
    _, out = _init_and_apply(model, x, jnp.array([0]))
    assert out.shape == (1, 1, 128)


def test_unet_unconditional_in_ch1():
    model = UNet1D(in_ch=1, base_ch=8, depth=2)
    use_sc, cond_ch = model._layout()
    assert use_sc is False and cond_ch == 0
    x = jnp.ones((2, 1, 64))
    _, out = _init_and_apply(model, x, jnp.array([1, 2]))
    assert out.shape == (2, 1, 64)


def test_unet_zero_init_final_head():
    """Freshly initialised net outputs exactly zero (zero-init final conv,
    ref models.py:133-134)."""
    model = UNet1D(in_ch=3, base_ch=8, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 128))
    _, out = _init_and_apply(model, x, jnp.array([3, 7]))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_unet_odd_length_fixups():
    """Non-power-of-two lengths exercise the static pad/crop fixups."""
    model = UNet1D(in_ch=3, base_ch=8, depth=3)
    x = jnp.ones((1, 3, 100))  # 100 -> 50 -> 25 -> 12 (floor) ... upsample fixups
    _, out = _init_and_apply(model, x, jnp.array([0]))
    assert out.shape == (1, 1, 100)


def test_unet_jit_and_grad():
    model = UNet1D(in_ch=3, base_ch=8, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 64))
    t = jnp.array([1, 2])
    params = model.init(jax.random.PRNGKey(1), x, t)

    @jax.jit
    def loss(p):
        return jnp.mean(model.apply(p, x, t) ** 2)

    g = jax.grad(loss)(params)
    # grads exist and are finite
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_unet_attention_extension():
    model = UNet1D(in_ch=3, base_ch=16, depth=2, use_attention=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 128))
    params, out = _init_and_apply(model, x, jnp.array([1, 2]))
    assert out.shape == (2, 1, 128)
    # attention params exist
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("mid_attn" in n for n in names)


def test_unet_conditioning_changes_output():
    """Same x_t, different cond -> different output (cond path is wired)."""
    model = UNet1D(in_ch=4, base_ch=8, depth=2, cond_in_ch=2, use_selfcond=True)
    key = jax.random.PRNGKey(0)
    x_t = jax.random.normal(key, (1, 1, 64))
    sc = jnp.zeros((1, 1, 64))
    cond_a = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 64))
    cond_b = jnp.zeros((1, 2, 64))
    xa = build_net_input(x_t, cond_a, sc)
    xb = build_net_input(x_t, cond_b, sc)
    params = model.init(jax.random.PRNGKey(2), xa, jnp.array([5]))
    # perturb final conv away from zero so outputs are non-trivial
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.ones_like(a), params)
    oa = model.apply(params, xa, jnp.array([5]))
    ob = model.apply(params, xb, jnp.array([5]))
    assert not np.allclose(np.asarray(oa), np.asarray(ob))


def test_unet_channels_last_consistency():
    model = UNet1D(in_ch=3, base_ch=8, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 64))
    t = jnp.array([1, 2])
    params = model.init(jax.random.PRNGKey(1), x, t)
    params = jax.tree_util.tree_map(lambda a: a + 0.01 * jnp.ones_like(a), params)
    out_cf = model.apply(params, x, t)
    out_cl = model.apply(params, jnp.transpose(x, (0, 2, 1)), t, channels_last=True)
    np.testing.assert_allclose(
        np.asarray(out_cf), np.asarray(jnp.transpose(out_cl, (0, 2, 1))),
        rtol=1e-5, atol=1e-6)


def test_fast_decoder_matches_plain():
    """DecoderConvBlock's algebraic upsample+concat+conv decomposition is
    numerically equivalent to the materialised path on the SAME params."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models.unet import (
        UNet1D,
    )

    rng = np.random.default_rng(0)
    for in_ch, cond, L in [(7, 5, 512), (3, 1, 384), (1, 0, 256)]:
        fast = UNet1D(in_ch=in_ch, base_ch=16, time_dim=32, depth=3,
                      cond_in_ch=cond, use_selfcond=(in_ch >= 3),
                      fast_decoder=True)
        plain = UNet1D(in_ch=in_ch, base_ch=16, time_dim=32, depth=3,
                       cond_in_ch=cond, use_selfcond=(in_ch >= 3),
                       fast_decoder=False)
        x = jnp.asarray(rng.normal(size=(2, in_ch, L)).astype(np.float32))
        t = jnp.asarray([3, 40])
        params = fast.init(jax.random.PRNGKey(0), x, t)
        # same param tree must be accepted by both paths
        y_f = np.asarray(fast.apply(params, x, t))
        y_p = np.asarray(plain.apply(params, x, t))
        np.testing.assert_allclose(y_f, y_p, rtol=2e-5, atol=1e-6)
