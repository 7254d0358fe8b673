"""MultilevelMoCoCLIP: momentum encoders, queues, ALBEF targets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synchformer_tpu.models.moco_clip import (
    MultilevelMoCoCLIP,
    dequeue_and_enqueue,
    init_queues,
    moco_contrastive_loss,
    moco_forward,
    momentum_update,
)

D = 32
S = 2

AUD_CFG = dict(
    target="synchformer_tpu.models.ast_encoder.ASTEncoder",
    params=dict(hidden_size=D, depth=1, num_heads=4, patch_size=8,
                frequency_stride=6, time_stride=6, num_mel_bins=20, max_spec_t=14,
                agg_time_module="AveragePooling", add_global_repr=True,
                agg_segments_module="TransformerEncoderLayer", max_segments=S))
VIS_CFG = dict(
    target="synchformer_tpu.models.motionformer.MotionFormerEncoder",
    params=dict(embed_dim=D, depth=1, num_heads=4, patch_size=8, z_block_size=2,
                temporal_resolution=2, img_size=16, drop_path_rate=0.0,
                agg_time_module="AveragePooling", add_global_repr=True,
                agg_segments_module="TransformerEncoderLayer", max_segments=S))
NOTHING = dict(target="synchformer_tpu.models.bridges.DoNothingBridge", params={})


@pytest.fixture(scope="module")
def moco_setup():
    rng = np.random.default_rng(0)
    model = MultilevelMoCoCLIP(n_embd=D, queue_size=8, momentum=0.99,
                               afeat_extractor=AUD_CFG, vfeat_extractor=VIS_CFG,
                               aproj=NOTHING, vproj=NOTHING)
    vis = jnp.asarray(rng.standard_normal((4, S, 4, 16, 16, 3)).astype(np.float32))
    aud = jnp.asarray(rng.standard_normal((4, S, 14, 20)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), vis, aud)["params"]
    return model, params, vis, aud


def test_forward_shapes(moco_setup):
    model, params, vis, aud = moco_setup
    out = model.apply({"params": params}, vis, aud)
    assert out["segment_vfeat"].shape == (4 * S, D)
    assert out["global_vfeat"].shape == (4, D)
    # normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["segment_afeat"]), axis=-1), 1.0, atol=1e-3)
    seg_scale, glob_scale = out["logit_scales"]
    assert 0.001 <= float(seg_scale) <= 0.5 and glob_scale is not None


def test_momentum_update_math(moco_setup):
    model, params, _, _ = moco_setup
    params_m = jax.tree.map(lambda p: jnp.zeros_like(p), params)
    upd = momentum_update(params, params_m, momentum=0.75)
    leaf = jax.tree_util.tree_leaves(params)[0]
    leaf_u = jax.tree_util.tree_leaves(upd)[0]
    np.testing.assert_allclose(np.asarray(leaf_u), 0.25 * np.asarray(leaf), rtol=1e-6)


def test_queue_roll():
    q = jnp.zeros((D, 8))
    feats = jnp.ones((4, D))
    q1, ptr1 = dequeue_and_enqueue(q, jnp.int32(0), feats)
    assert int(ptr1) == 4
    assert np.asarray(q1)[:, :4].sum() == D * 4 and np.asarray(q1)[:, 4:].sum() == 0
    q2, ptr2 = dequeue_and_enqueue(q1, ptr1, 2 * feats)
    assert int(ptr2) == 0  # wrapped
    assert np.asarray(q2)[:, 4:].sum() == 2 * D * 4


def test_albef_targets_change_loss(rng):
    v = jnp.asarray(rng.standard_normal((4, D)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((4, D)).astype(np.float32))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    hard = float(moco_contrastive_loss(v, a, v.T, a.T, 0.07, alpha=0.0))
    soft = float(moco_contrastive_loss(v, a, v.T, a.T, 0.07, alpha=0.4,
                                       vfeat_m=v, afeat_m=a))
    assert np.isfinite(hard) and np.isfinite(soft)
    assert hard != soft


def test_full_moco_step(moco_setup):
    model, params, vis, aud = moco_setup
    params_m = jax.tree.map(jnp.copy, params)
    queues = init_queues(jax.random.PRNGKey(1), D,
                         segment_queue_size=8 * S, global_queue_size=8)
    losses, new_queues, out = moco_forward(model, params, params_m, queues,
                                           vis, aud, alpha=0.4, train=True)
    assert np.isfinite(float(losses["segment_contrastive_loss"]))
    assert np.isfinite(float(losses["global_contrastive_loss"]))
    # queues rolled: first 8 columns are the momentum segment keys
    np.testing.assert_allclose(np.asarray(new_queues.segment_v[:, :8]),
                               np.asarray(out["segment_vfeat"].T), atol=2e-2)
    assert int(new_queues.segment_ptr) == 8
    assert int(new_queues.global_ptr) == 4