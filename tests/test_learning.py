"""Optimization sanity: the jitted train steps actually learn (loss drops when
overfitting one batch) — the step-level complement of the epoch-level
integration tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synchformer_tpu.models.sync_model import Synchformer
from synchformer_tpu.train.state import SyncTrainState, make_optimizer
from synchformer_tpu.train.step import make_sync_train_step

from tests.test_models import TINY_AUD, TINY_PROJ, TINY_TRANSFORMER, TINY_VIS


@pytest.mark.slow
def test_sync_train_step_overfits_one_batch(rng):
    model = Synchformer(afeat_extractor=TINY_AUD, vfeat_extractor=TINY_VIS,
                        aproj=TINY_PROJ, vproj=TINY_PROJ,
                        transformer=TINY_TRANSFORMER)
    batch = {
        "vis": jnp.asarray(rng.standard_normal((4, 3, 4, 16, 16, 3)).astype(np.float32)),
        "aud": jnp.asarray(rng.standard_normal((4, 3, 14, 20)).astype(np.float32)),
        "targets": jnp.asarray([1, 7, 13, 19], dtype=jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["vis"], batch["aud"])["params"]
    tx = make_optimizer("adam", lr=3e-4, max_clip_norm=1.0)
    state = SyncTrainState.create(params, tx)
    step = make_sync_train_step(model, donate=False)
    key = jax.random.PRNGKey(0)

    first_loss = None
    for i in range(80):
        state, metrics = step(state, batch, key)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))

    # judge the fit on a DETERMINISTIC forward (the in-step metrics ride the
    # dropout forward, so they are rng-stream-dependent noise)
    eval_loss, eval_logits = model.apply(
        {"params": {**state.frozen, **state.trainable}},
        batch["vis"], batch["aud"], batch["targets"], deterministic=True)
    # overfitting 4 examples with a trainable head must crush the loss
    assert float(eval_loss) < first_loss * 0.5, (first_loss, float(eval_loss))
    acc = float((jnp.argmax(eval_logits, -1) == batch["targets"]).mean())
    assert acc >= 0.75, acc

    # frozen towers really are frozen: their params did not move
    leaf0 = jax.tree_util.tree_leaves(params["v_encoder"])[0]
    leaf1 = jax.tree_util.tree_leaves(state.frozen["v_encoder"])[0]
    np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(leaf1))
