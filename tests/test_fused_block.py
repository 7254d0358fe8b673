"""Fused LN+QKV+attention and LN+MLP+residual megakernels == the XLA-composed
reference path (interpret mode on CPU), values AND gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from synchformer_tpu.ops.pallas.fused_block import (
    _fused_attention_ref,
    _fused_mlp_ref,
    fused_divided_attention,
    fused_mlp_residual,
)

F, N, HEADS, DH = 3, 8, 4, 8
SEQ, D = 1 + F * N, HEADS * DH


def _attn_inputs(rng):
    x = jnp.asarray(rng.standard_normal((2, SEQ, D)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((D, 3 * D)) / np.sqrt(D)).astype(np.float32))
    bias = jnp.asarray(0.02 * rng.standard_normal(3 * D).astype(np.float32))
    return x, g, b, w, bias


@pytest.mark.parametrize("mode", ["space", "time"])
def test_fused_attention_matches_ref(rng, mode):
    x, g, b, w, bias = _attn_inputs(rng)
    with pltpu.force_tpu_interpret_mode():
        got = fused_divided_attention(x, g, b, w, bias, HEADS, F, mode)
        golden = _fused_attention_ref(x, g, b, w, bias, HEADS, F, mode, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["space", "time"])
def test_fused_attention_grads_match_ref(rng, mode):
    """custom-VJP backward (ref recompute incl. the pallas attention bwd)
    == jax.grad of the pure composed reference."""
    x, g, b, w, bias = _attn_inputs(rng)

    def loss_fused(*a):
        return jnp.sum(fused_divided_attention(*a, HEADS, F, mode) ** 2)

    def loss_ref(*a):
        return jnp.sum(_fused_attention_ref(*a, HEADS, F, mode, 1e-6) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, g, b, w, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, g, b, w, bias)
    for a, c in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-5)


def test_fused_mlp_matches_ref(rng):
    x = jnp.asarray(rng.standard_normal((2, SEQ, D)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
    h = 4 * D
    w1 = jnp.asarray((rng.standard_normal((D, h)) / np.sqrt(D)).astype(np.float32))
    b1 = jnp.asarray(0.02 * rng.standard_normal(h).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((h, D)) / np.sqrt(h)).astype(np.float32))
    b2 = jnp.asarray(0.02 * rng.standard_normal(D).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = fused_mlp_residual(x, g, b, w1, b1, w2, b2)
        golden = _fused_mlp_ref(x, g, b, w1, b1, w2, b2, 1e-6)
        grads_f = jax.grad(lambda *a: jnp.sum(
            fused_mlp_residual(*a) ** 2), argnums=(0, 3, 5))(x, g, b, w1, b1, w2, b2)
        grads_r = jax.grad(lambda *a: jnp.sum(
            _fused_mlp_ref(*a, 1e-6) ** 2), argnums=(0, 3, 5))(x, g, b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                               rtol=2e-4, atol=2e-5)
    for a, c in zip(grads_f, grads_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-5)


def test_block_pallas_full_fusion_matches_xla(rng):
    """The whole DividedSpaceTimeBlock on the pallas path (fused attention +
    fused MLP) == the XLA path with the same params."""
    from synchformer_tpu.models.motionformer import DividedSpaceTimeBlock

    x = jnp.asarray(rng.standard_normal((2, SEQ, D)).astype(np.float32))
    blk_x = DividedSpaceTimeBlock(num_heads=HEADS, num_frames=F, attn_impl="xla")
    variables = blk_x.init(jax.random.PRNGKey(0), x)
    golden = blk_x.apply(variables, x)

    blk_p = DividedSpaceTimeBlock(num_heads=HEADS, num_frames=F,
                                  attn_impl="pallas_fused")
    with pltpu.force_tpu_interpret_mode():
        got = blk_p.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                               rtol=2e-4, atol=2e-5)
