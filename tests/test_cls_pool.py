"""Fused CLS-pool encoder-layer kernel == the XLA-composed reference
(interpret mode on CPU), values AND gradients, plus the PreLNBlock routing.

The reference math is PreLNBlock(query_rows=1) (models/layers.py), i.e. the
aggregator layer of ref: visual/motionformer.py:275-347 restricted to the
CLS row.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from synchformer_tpu.ops.pallas.cls_pool import (
    _cls_pool_ref,
    fused_cls_pool,
)

HEADS, DH = 4, 8
D = HEADS * DH


def _inputs(rng, bsz=6, n=13, hidden=4 * D):
    def r(*shape, s=1.0):
        return jnp.asarray((s * rng.standard_normal(shape)).astype(np.float32))

    x = r(bsz, n, D)
    return dict(
        x=x,
        g1=1.0 + r(D, s=0.1), b1=r(D, s=0.1),
        wqkv=r(D, 3 * D, s=D ** -0.5), bqkv=r(3 * D, s=0.02),
        wp=r(D, D, s=D ** -0.5), bp=r(D, s=0.02),
        g2=1.0 + r(D, s=0.1), b2=r(D, s=0.1),
        w1=r(D, hidden, s=D ** -0.5), fb1=r(hidden, s=0.02),
        w2=r(hidden, D, s=hidden ** -0.5), fb2=r(D, s=0.02),
    )


@pytest.mark.parametrize("bsz,n", [(6, 13), (8, 21), (5, 9)])
def test_cls_pool_matches_ref(rng, bsz, n):
    a = _inputs(rng, bsz=bsz, n=n)
    with pltpu.force_tpu_interpret_mode():
        got = fused_cls_pool(*a.values(), num_heads=HEADS, eps=1e-6)
    golden = _cls_pool_ref(*a.values(), num_heads=HEADS, eps=1e-6)
    assert got.shape == (bsz, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                               rtol=2e-4, atol=3e-5)


def test_cls_pool_grads_match_ref(rng):
    a = _inputs(rng)
    args = list(a.values())

    def loss_fused(*args):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_cls_pool(*args, num_heads=HEADS,
                                          eps=1e-6) ** 2)

    def loss_ref(*args):
        return jnp.sum(_cls_pool_ref(*args, num_heads=HEADS, eps=1e-6) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    for got, golden in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                                   rtol=2e-3, atol=2e-4)


def test_preln_block_pallas_query_rows_matches_xla(rng):
    """PreLNBlock(impl='pallas', query_rows=1) routes through the fused
    kernel and must equal the XLA query_rows path on the same params —
    including the bf16 compute dtype the aggregators run in."""
    from synchformer_tpu.models.layers import PreLNBlock

    x32 = rng.standard_normal((6, 13, D)).astype(np.float32)
    for dtype, tol in ((jnp.float32, 3e-5), (jnp.bfloat16, 2e-2)):
        blk_x = PreLNBlock(num_heads=HEADS, ln_eps=1e-6, dtype=dtype,
                           impl="xla")
        blk_p = PreLNBlock(num_heads=HEADS, ln_eps=1e-6, dtype=dtype,
                           impl="pallas")
        x = jnp.asarray(x32, dtype=dtype)
        vs = blk_x.init(jax.random.PRNGKey(0), x, query_rows=1)
        with pltpu.force_tpu_interpret_mode():
            vs_p = blk_p.init(jax.random.PRNGKey(0), x, query_rows=1)
        # identical tree through either branch
        assert (jax.tree_util.tree_structure(vs)
                == jax.tree_util.tree_structure(vs_p))
        ref = blk_x.apply(vs, x, query_rows=1)
        with pltpu.force_tpu_interpret_mode():
            got = blk_p.apply(vs, x, query_rows=1)
        assert got.shape == ref.shape == (6, 1, D)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=tol, atol=tol)


def test_cls_pool_encoder_layer_pallas(rng):
    """CLSPoolEncoderLayer(impl='pallas') — the aggregator entry point —
    matches the XLA implementation (CLS prepend + block + CLS readout)."""
    from synchformer_tpu.models.aggregators import CLSPoolEncoderLayer

    x = jnp.asarray(rng.standard_normal((4, 12, D)).astype(np.float32))
    lx = CLSPoolEncoderLayer(num_heads=HEADS, impl="xla")
    lp = CLSPoolEncoderLayer(num_heads=HEADS, impl="pallas")
    vs = lx.init(jax.random.PRNGKey(0), x)
    ref = lx.apply(vs, x)
    with pltpu.force_tpu_interpret_mode():
        got = lp.apply(vs, x)
    assert got.shape == (4, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=3e-5)


@pytest.mark.parametrize("bsz,m", [(6, 12), (4, 20)])
def test_cls_pool_tokens_matches_concat(rng, bsz, m):
    """fused_cls_pool_tokens(tokens, cls) == fused_cls_pool(concat) — the
    no-materialized-concat contract, values and gradients."""
    from synchformer_tpu.ops.pallas.cls_pool import (
        _cls_pool_tokens_ref,
        fused_cls_pool_tokens,
    )

    a = _inputs(rng, bsz=bsz, n=m)  # reuse builder; x is the TOKEN tensor
    cls = jnp.asarray(0.05 * rng.standard_normal((1, D)).astype(np.float32))
    args = [a["x"], cls] + [v for k, v in a.items() if k != "x"]
    with pltpu.force_tpu_interpret_mode():
        got = fused_cls_pool_tokens(*args, num_heads=HEADS, eps=1e-6)
    golden = _cls_pool_tokens_ref(*args, num_heads=HEADS, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                               rtol=2e-4, atol=3e-5)

    def loss_fused(*args):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_cls_pool_tokens(*args, num_heads=HEADS,
                                                 eps=1e-6) ** 2)

    def loss_ref(*args):
        return jnp.sum(_cls_pool_tokens_ref(*args, num_heads=HEADS,
                                            eps=1e-6) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 4))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 4))(*args)
    for got_g, golden_g in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(golden_g),
                                   rtol=2e-3, atol=2e-4)


def test_cls_pool_encoder_layer_pos_emb_pallas(rng):
    """The global/temporal aggregator flavor (learned pos-emb) through the
    split-CLS fused path == the XLA concat path."""
    from synchformer_tpu.models.aggregators import CLSPoolEncoderLayer

    x = jnp.asarray(rng.standard_normal((4, 9, D)).astype(np.float32))
    kw = dict(num_heads=HEADS, add_pos_emb=True, pos_max_len=14)
    lx = CLSPoolEncoderLayer(impl="xla", **kw)
    lp = CLSPoolEncoderLayer(impl="pallas", **kw)
    vs = lx.init(jax.random.PRNGKey(0), x)
    ref = lx.apply(vs, x)
    with pltpu.force_tpu_interpret_mode():
        got = lp.apply(vs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=3e-5)


def test_cls_pool_encoder_layer_masked_falls_back(rng):
    """keep_mask forces the explicit-concat XLA path (the fused kernel is
    unmasked-only) — and the mask semantics survive."""
    from synchformer_tpu.models.aggregators import CLSPoolEncoderLayer

    x = jnp.asarray(rng.standard_normal((3, 8, D)).astype(np.float32))
    keep = jnp.asarray(rng.integers(0, 2, (3, 8)).astype(bool))
    keep = keep.at[:, 0].set(True)  # at least one kept token
    lp = CLSPoolEncoderLayer(num_heads=HEADS, impl="pallas")
    lx = CLSPoolEncoderLayer(num_heads=HEADS, impl="xla")
    vs = lx.init(jax.random.PRNGKey(0), x, keep_mask=keep)
    ref = lx.apply(vs, x, keep_mask=keep)
    got = lp.apply(vs, x, keep_mask=keep)  # no interpret ctx needed: XLA path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_cls_pool_illegal_chunk_falls_back(rng):
    """bsz with no sublane-multiple divisor <= the unroll cap (e.g. 28, the
    Stage-I temporal-agg batch) must take the XLA fallback instead of an
    illegal (segs, D) Mosaic output block — regression: bench train_error."""
    from synchformer_tpu.ops.pallas.cls_pool import (
        _cls_pool_ref,
        _seg_chunk,
        fused_cls_pool,
    )

    assert _seg_chunk(28, 9) == 0
    assert _seg_chunk(896, 197) == 8
    assert _seg_chunk(672, 14) == 16
    assert _seg_chunk(6, 13) == 6  # covers-whole-array case

    a = _inputs(rng, bsz=28, n=9)
    got = fused_cls_pool(*a.values(), num_heads=HEADS, eps=1e-6)  # no interpret ctx: pure-XLA fallback
    golden = _cls_pool_ref(*a.values(), num_heads=HEADS, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                               rtol=1e-6, atol=1e-6)
