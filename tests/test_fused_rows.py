"""Row-chunked fused kernels (ops/pallas/fused_rows.py): interpret-mode
equality against the XLA compositions, including the custom-VJP gradients.

ref: the fused ops reproduce motionformer_src/vit_helper.py:332-376 block
numerics (pre-LN + qkv / pre-LN + mlp + residual)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from synchformer_tpu.ops.pallas.fused_block import dense, layer_norm
from synchformer_tpu.ops.pallas.fused_rows import (
    _ln_mlp_ref,
    _ln_matmul_ref,
    fused_ln_matmul,
    fused_ln_mlp_residual,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _ln_params(rng, d):
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
    return g, b


def test_fused_ln_matmul_matches_ref(rng):
    d, dout = 64, 192
    x = jnp.asarray(rng.standard_normal((2, 24, d)).astype(np.float32))
    g, b = _ln_params(rng, d)
    w = jnp.asarray((rng.standard_normal((d, dout)) / 8).astype(np.float32))
    bias = jnp.asarray(0.02 * rng.standard_normal(dout).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = fused_ln_matmul(x, g, b, w, bias)
    ref = _ln_matmul_ref(x, g, b, w, bias, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_ln_mlp_matches_ref_and_grad(rng):
    d, h = 64, 256
    x = jnp.asarray(rng.standard_normal((2, 24, d)).astype(np.float32))
    g, b = _ln_params(rng, d)
    w1 = jnp.asarray((rng.standard_normal((d, h)) / 8).astype(np.float32))
    b1 = jnp.asarray(0.02 * rng.standard_normal(h).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((h, d)) / 16).astype(np.float32))
    b2 = jnp.asarray(0.02 * rng.standard_normal(d).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = fused_ln_mlp_residual(x, g, b, w1, b1, w2, b2)
    ref = _ln_mlp_ref(x, g, b, w1, b1, w2, b2, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss(x):
        return jnp.sum(fused_ln_mlp_residual(x, g, b, w1, b1, w2, b2) ** 2)

    def loss_ref(x):
        return jnp.sum(_ln_mlp_ref(x, g, b, w1, b1, w2, b2, 1e-6) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gx = jax.grad(loss)(x)
    gref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gref),
                               rtol=1e-4, atol=1e-4)


def test_fused_ln_mlp_slab_path_matches_ref(rng):
    """4D input with a non-sublane-multiple token axis (the tower's split
    (B, f, n, D) patches layout, n % 8 != 0) routes through the slab-chunked
    kernel — same numerics, no flatten relayout."""
    d, h, n = 64, 256, 67  # n % 8 != 0 and n >= 64 -> slab path
    x = jnp.asarray(rng.standard_normal((2, 3, n, d)).astype(np.float32))
    g, b = _ln_params(rng, d)
    w1 = jnp.asarray((rng.standard_normal((d, h)) / 8).astype(np.float32))
    b1 = jnp.asarray(0.02 * rng.standard_normal(h).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((h, d)) / 16).astype(np.float32))
    b2 = jnp.asarray(0.02 * rng.standard_normal(d).astype(np.float32))
    from synchformer_tpu.ops.pallas import fused_rows as fr

    with pltpu.force_tpu_interpret_mode():
        got_slab = fr._ln_mlp_pallas_slab(x, g, b, w1, b1, w2, b2, 1e-6)
        got = fused_ln_mlp_residual(x, g, b, w1, b1, w2, b2)
    ref = _ln_mlp_ref(x, g, b, w1, b1, w2, b2, 1e-6)
    np.testing.assert_allclose(np.asarray(got_slab), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_motionformer_split_flow_matches_xla(rng):
    """The (cls, patches) split token flow (pallas 4D kernels, fused MLP)
    must equal the packed XLA flow on identical params — full tiny tower."""
    from synchformer_tpu.models.motionformer import MotionFormerEncoder

    params_cfg = dict(embed_dim=256, depth=2, num_heads=4, patch_size=8,
                      z_block_size=2, temporal_resolution=2, img_size=32,
                      factorize_space_time=True,
                      agg_space_module="TransformerEncoderLayer",
                      agg_time_module="Identity", dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 32, 32, 3)).astype(np.float32))

    mx = MotionFormerEncoder(**params_cfg, attn_impl="xla")
    variables = mx.init(jax.random.PRNGKey(0), x)
    ref, _ = mx.apply(variables, x)

    mp = MotionFormerEncoder(**params_cfg, attn_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        got, _ = mp.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_motionformer_split_flow_grad_matches_xla(rng):
    """Gradients through the split flow (custom-VJP slab attention + fused
    MLP) equal the XLA tower's gradients — the Stage-I training path."""
    from synchformer_tpu.models.motionformer import MotionFormerEncoder

    params_cfg = dict(embed_dim=256, depth=1, num_heads=4, patch_size=8,
                      z_block_size=2, temporal_resolution=2, img_size=32,
                      factorize_space_time=True,
                      agg_space_module="TransformerEncoderLayer",
                      agg_time_module="Identity", dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 2, 4, 32, 32, 3)).astype(np.float32))

    mx = MotionFormerEncoder(**params_cfg, attn_impl="xla")
    variables = mx.init(jax.random.PRNGKey(0), x)
    mp = MotionFormerEncoder(**params_cfg, attn_impl="pallas")

    def loss(v, model):
        out, _ = model.apply(v, x)
        return jnp.sum(out ** 2)

    gref = jax.grad(lambda v: loss(v, mx))(variables)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda v: loss(v, mp))(variables)
    flat_ref = jax.tree_util.tree_leaves_with_path(gref)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got))
    for path, leaf in flat_ref:
        other = flat_got[path]
        # f32 accumulation-order differences through the pallas backward
        # kernels show up at ~1e-3 relative on O(100) grads; this is
        # rounding, not semantics (12/98k elements at 5e-4)
        np.testing.assert_allclose(np.asarray(other), np.asarray(leaf),
                                   rtol=3e-3, atol=1e-2,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("n", [13, 74, 197])
def test_standard_attention_matches_ref(rng, n):
    from synchformer_tpu.ops.pallas.standard_attention import (
        standard_attention, standard_attention_ref)

    b, heads, dh = 8, 4, 64
    d = heads * dh
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = standard_attention(qkv, heads)
    ref = standard_attention_ref(qkv, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    def loss(x):
        return jnp.sum(standard_attention(x, heads) ** 2)

    def loss_ref(x):
        return jnp.sum(standard_attention_ref(x, heads) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(qkv)
    gref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               rtol=1e-4, atol=1e-4)


def test_preln_block_pallas_attention_matches_xla(rng):
    from synchformer_tpu.models.layers import PreLNBlock

    b, n, d = 8, 74, 256
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    bx = PreLNBlock(num_heads=4, impl="xla")
    variables = bx.init(jax.random.PRNGKey(0), x)
    ref = bx.apply(variables, x)
    bp = PreLNBlock(num_heads=4, impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        got = bp.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_ln_mlp_stats_matches_ref(rng):
    """The stats-emitting slab variant: out == plain variant, stats ==
    LN statistics of the cast output, and gradients match the XLA
    composition (stats gradients included — the stats feed the next
    block's LN, so they are differentiated through)."""
    from jax.experimental.pallas import tpu as pltpu

    from synchformer_tpu.ops.pallas.fused_rows import (
        _ln_mlp_stats_ref,
        fused_ln_mlp_residual,
        fused_ln_mlp_residual_stats,
    )

    D, H, n = 32, 128, 12  # n % 8 != 0: the slab layout
    x = jnp.asarray(rng.standard_normal((3, 2, n, D)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((D, H)) / np.sqrt(D)).astype(np.float32))
    b1 = jnp.asarray(0.02 * rng.standard_normal(H).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((H, D)) / np.sqrt(H)).astype(np.float32))
    b2 = jnp.asarray(0.02 * rng.standard_normal(D).astype(np.float32))
    args = (x, g, b, w1, b1, w2, b2)

    with pltpu.force_tpu_interpret_mode():
        out, stats = fused_ln_mlp_residual_stats(*args)
        plain = fused_ln_mlp_residual(*args)
    ref_out, ref_stats = _ln_mlp_stats_ref(*args, eps=1e-6)
    assert stats.shape == (3, 2, n, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(stats[..., :2]),
                               np.asarray(ref_stats[..., :2]),
                               rtol=2e-4, atol=3e-5)

    def loss_fused(*a):
        with pltpu.force_tpu_interpret_mode():
            o, s = fused_ln_mlp_residual_stats(*a)
        return jnp.sum(o ** 2) + jnp.sum(s[..., :2] ** 2)

    def loss_ref(*a):
        o, s = _ln_mlp_stats_ref(*a, eps=1e-6)
        return jnp.sum(o ** 2) + jnp.sum(s[..., :2] ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 3))(*args)
    for got_g, golden_g in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(golden_g),
                                   rtol=2e-3, atol=2e-4)
