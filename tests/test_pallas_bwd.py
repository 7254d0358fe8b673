"""Gradient parity: the pallas backward kernels == jax.grad of the XLA path
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from synchformer_tpu.models.motionformer import DividedAttention, MotionFormerEncoder


@pytest.mark.parametrize("mode", ["space", "time"])
def test_divided_attention_grads_match_xla(rng, mode):
    f, n, heads, dh = 3, 8, 4, 8
    seq, d = 1 + f * n, heads * dh
    x = jnp.asarray(rng.standard_normal((2, seq, d)).astype(np.float32))

    attn_x = DividedAttention(num_heads=heads, attn_impl="xla")
    variables = attn_x.init(jax.random.PRNGKey(0), x, f, mode)

    def loss_xla(params, x):
        out = attn_x.apply(params, x, f, mode)
        return jnp.sum(jnp.sin(out))  # non-trivial cotangents

    attn_p = DividedAttention(num_heads=heads, attn_impl="pallas")

    def loss_pallas(params, x):
        out = attn_p.apply(params, x, f, mode)
        return jnp.sum(jnp.sin(out))

    g_params_x, g_x_x = jax.grad(loss_xla, argnums=(0, 1))(variables, x)
    with pltpu.force_tpu_interpret_mode():
        g_params_p, g_x_p = jax.grad(loss_pallas, argnums=(0, 1))(variables, x)

    np.testing.assert_allclose(np.asarray(g_x_p), np.asarray(g_x_x),
                               rtol=5e-4, atol=5e-5)
    for (path_x, gx), (path_p, gp) in zip(
            jax.tree_util.tree_leaves_with_path(g_params_x),
            jax.tree_util.tree_leaves_with_path(g_params_p)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=str(path_x))


@pytest.mark.parametrize("mode", ["space", "time"])
def test_split_layout_grads_match_xla(rng, mode):
    """4D split-(cls, patches) layout with a 128-lane-aligned head pairing:
    the dedicated 4D backward kernels (no packed conversion) == jax.grad of
    the XLA path on the concatenated sequence."""
    f, n, heads, dh = 2, 8, 2, 64  # d=128 -> hpg=2, width=128: 4D path
    seq, d = 1 + f * n, heads * dh
    b = 2
    x = jnp.asarray(rng.standard_normal((b, seq, d)).astype(np.float32))

    attn_x = DividedAttention(num_heads=heads, attn_impl="xla")
    variables = attn_x.init(jax.random.PRNGKey(0), x, f, mode)

    def loss_xla(params, x):
        out = attn_x.apply(params, x, f, mode)
        return jnp.sum(jnp.sin(out))

    g_params_x, g_x_x = jax.grad(loss_xla, argnums=(0, 1))(variables, x)

    attn_p = DividedAttention(num_heads=heads, attn_impl="pallas")

    def loss_split(params, x_cls, x_patch):
        out_c, out_p = attn_p.apply(params, (x_cls, x_patch), f, mode)
        return jnp.sum(jnp.sin(out_c)) + jnp.sum(jnp.sin(out_p))

    x_cls = x[:, :1]
    x_patch = x[:, 1:].reshape(b, f, n, d)
    with pltpu.force_tpu_interpret_mode():
        g_params_p, g_c, g_p = jax.grad(loss_split, argnums=(0, 1, 2))(
            variables, x_cls, x_patch)

    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_x_x[:, :1]),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x_x[:, 1:].reshape(b, f, n, d)),
        rtol=5e-4, atol=5e-5)
    for (path_x, gx), (_, gp) in zip(
            jax.tree_util.tree_leaves_with_path(g_params_x),
            jax.tree_util.tree_leaves_with_path(g_params_p)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=5e-4, atol=5e-5, err_msg=str(path_x))


@pytest.mark.parametrize("mode", ["space", "time"])
def test_fused_proj_residual_grads_match_xla(rng, mode):
    """Fused proj+residual epilogue: d(loss)/d(qkv-inputs, residual, proj
    params) == jax.grad of the XLA path + manual residual (the custom-VJP
    composes the 4D attention backward with the projection matmul grads)."""
    f, n, heads, dh = 2, 8, 2, 64
    seq, d = 1 + f * n, heads * dh
    b = 2
    x = jnp.asarray(rng.standard_normal((b, seq, d)).astype(np.float32))
    res = jnp.asarray(rng.standard_normal((b, seq, d)).astype(np.float32))

    attn_x = DividedAttention(num_heads=heads, attn_impl="xla")
    variables = attn_x.init(jax.random.PRNGKey(0), x, f, mode)

    def loss_xla(params, x, res):
        out = res + attn_x.apply(params, x, f, mode)
        return jnp.sum(jnp.sin(out))

    g_params_x, g_x_x, g_r_x = jax.grad(loss_xla, argnums=(0, 1, 2))(
        variables, x, res)

    attn_p = DividedAttention(num_heads=heads, attn_impl="pallas")

    def loss_fused(params, x_cls, x_patch, r_cls, r_patch):
        y_c, y_p = attn_p.apply(params, (x_cls, x_patch), f, mode,
                                residual=(r_cls, r_patch))
        return jnp.sum(jnp.sin(y_c)) + jnp.sum(jnp.sin(y_p))

    with pltpu.force_tpu_interpret_mode():
        g_params_p, g_c, g_p, g_rc, g_rp = jax.grad(
            loss_fused, argnums=(0, 1, 2, 3, 4))(
            variables, x[:, :1], x[:, 1:].reshape(b, f, n, d),
            res[:, :1], res[:, 1:].reshape(b, f, n, d))

    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_x_x[:, :1]),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x_x[:, 1:].reshape(b, f, n, d)),
        rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(g_rc), np.asarray(g_r_x[:, :1]),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(g_rp), np.asarray(g_r_x[:, 1:].reshape(b, f, n, d)),
        rtol=5e-4, atol=5e-5)
    for (path_x, gx), (_, gp) in zip(
            jax.tree_util.tree_leaves_with_path(g_params_x),
            jax.tree_util.tree_leaves_with_path(g_params_p)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=5e-4, atol=5e-5, err_msg=str(path_x))


def test_encoder_tower_grads_match_xla(rng):
    """Full 2-block tower: d(loss)/d(params) identical between impls."""
    params_cfg = dict(embed_dim=32, depth=2, num_heads=4, patch_size=8,
                      z_block_size=2, temporal_resolution=2, img_size=16,
                      drop_path_rate=0.0)
    x = jnp.asarray(rng.standard_normal((1, 2, 4, 16, 16, 3)).astype(np.float32))
    model_x = MotionFormerEncoder(**params_cfg)
    model_p = MotionFormerEncoder(**params_cfg, attn_impl="pallas")
    variables = model_x.init(jax.random.PRNGKey(0), x)

    def loss(model, v):
        feats, _ = model.apply(v, x)
        return jnp.mean(feats ** 2)

    g_x = jax.grad(lambda v: loss(model_x, v))(variables)
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(lambda v: loss(model_p, v))(variables)
    for (path, gx), (_, gp) in zip(
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_p)):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-3, atol=1e-4, err_msg=str(path))
