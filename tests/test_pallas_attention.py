"""Pallas divided-attention kernel == XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from synchformer_tpu.models.motionformer import DividedAttention, MotionFormerEncoder


@pytest.mark.parametrize("mode", ["space", "time"])
def test_pallas_kernel_matches_xla(rng, mode):
    f, n, heads, dh = 3, 8, 4, 8
    seq, d = 1 + f * n, heads * dh
    x = jnp.asarray(rng.standard_normal((2, seq, d)).astype(np.float32))

    attn_x = DividedAttention(num_heads=heads, attn_impl="xla")
    variables = attn_x.init(jax.random.PRNGKey(0), x, f, mode)
    golden = attn_x.apply(variables, x, f, mode)

    attn_p = DividedAttention(num_heads=heads, attn_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        got = attn_p.apply(variables, x, f, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["space", "time"])
def test_split_layout_forward_matches_xla(rng, mode):
    """4D split-(cls, patches) layout at a 128-lane-aligned head pairing
    (dh=64 -> lane-masked head pairs, the production-dims code path incl.
    the MXU ones-lane denominator): forward VALUES == the XLA path."""
    f, n, heads, dh = 2, 8, 2, 64  # d=128 -> hpg=2, width=128: 4D path
    seq, d = 1 + f * n, heads * dh
    b = 2
    x = jnp.asarray(rng.standard_normal((b, seq, d)).astype(np.float32))

    attn_x = DividedAttention(num_heads=heads, attn_impl="xla")
    variables = attn_x.init(jax.random.PRNGKey(0), x, f, mode)
    golden = attn_x.apply(variables, x, f, mode)

    attn_p = DividedAttention(num_heads=heads, attn_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        out_c, out_p = attn_p.apply(
            variables, (x[:, :1], x[:, 1:].reshape(b, f, n, d)), f, mode)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(golden[:, :1]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(golden[:, 1:].reshape(b, f, n, d)),
        rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["space", "time"])
def test_fused_proj_residual_matches_xla(rng, mode):
    """Fused output-projection + residual epilogue (the deterministic-path
    kernel, ops/pallas/divided_attention.py::divided_attention_proj_4d):
    module output with residual= == XLA path + manual residual add."""
    f, n, heads, dh = 2, 8, 2, 64  # d=128 -> hpg=2, width=128: 4D path
    seq, d = 1 + f * n, heads * dh
    b = 2
    x = jnp.asarray(rng.standard_normal((b, seq, d)).astype(np.float32))
    res = jnp.asarray(rng.standard_normal((b, seq, d)).astype(np.float32))

    attn_x = DividedAttention(num_heads=heads, attn_impl="xla")
    variables = attn_x.init(jax.random.PRNGKey(0), x, f, mode)
    golden = res + attn_x.apply(variables, x, f, mode)

    attn_p = DividedAttention(num_heads=heads, attn_impl="pallas")
    res_pair = (res[:, :1], res[:, 1:].reshape(b, f, n, d))
    with pltpu.force_tpu_interpret_mode():
        y_c, y_p = attn_p.apply(
            variables, (x[:, :1], x[:, 1:].reshape(b, f, n, d)), f, mode,
            residual=res_pair)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(golden[:, :1]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(y_p), np.asarray(golden[:, 1:].reshape(b, f, n, d)),
        rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["space", "time"])
def test_pallas_with_mask_falls_back_to_xla(rng, mode, caplog):
    """attn_impl='pallas' + keep_mask: the kernels are unmasked-only, so the
    module must route to the (masked) XLA path with identical numerics and a
    one-time warning — never a silent wrong answer."""
    import logging

    import synchformer_tpu.models.motionformer as mf

    f, n, heads, dh = 3, 8, 4, 8
    seq, d = 1 + f * n, heads * dh
    x = jnp.asarray(rng.standard_normal((2, seq, d)).astype(np.float32))
    keep = np.ones((2, seq), dtype=bool)
    keep[:, 5:9] = False
    keep = jnp.asarray(keep)

    attn_x = DividedAttention(num_heads=heads, attn_impl="xla")
    variables = attn_x.init(jax.random.PRNGKey(0), x, f, mode)
    golden = attn_x.apply(variables, x, f, mode, keep_mask=keep)

    mf._WARNED_PALLAS_MASK_FALLBACK = False
    attn_p = DividedAttention(num_heads=heads, attn_impl="pallas")
    with caplog.at_level(logging.WARNING):
        got = attn_p.apply(variables, x, f, mode, keep_mask=keep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                               rtol=1e-6, atol=1e-7)
    assert mf._WARNED_PALLAS_MASK_FALLBACK
    assert any("falling back" in r.message for r in caplog.records)


def test_pallas_encoder_matches_xla(rng):
    params = dict(embed_dim=32, depth=2, num_heads=4, patch_size=8, z_block_size=2,
                  temporal_resolution=2, img_size=16, drop_path_rate=0.0)
    x = jnp.asarray(rng.standard_normal((1, 2, 4, 16, 16, 3)).astype(np.float32))
    model_x = MotionFormerEncoder(**params)
    variables = model_x.init(jax.random.PRNGKey(0), x)
    golden, _ = model_x.apply(variables, x)

    model_p = MotionFormerEncoder(**params, attn_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        got, _ = model_p.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                               rtol=2e-4, atol=2e-5)
