"""Orbax checkpoint manager: full-payload save/restore round trip + best-step
semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from synchformer_tpu.train.state import SyncTrainState, make_optimizer
from synchformer_tpu.utils.checkpoint import CheckpointManager


def test_save_restore_roundtrip_with_opt_state(tmp_path, rng):
    params = {"a_proj": {"linear": {"kernel": jnp.asarray(
        rng.standard_normal((4, 4)).astype(np.float32))}},
        "v_encoder": {"w": jnp.ones((2,))}}
    tx = make_optimizer("adam", lr=1e-3)
    state = SyncTrainState.create(params, tx, trainable_keys=("a_proj",))
    # take a step so the optimizer state is non-trivial
    grads = jax.tree.map(jnp.ones_like, state.trainable)
    state, _ = state.apply_gradients(grads)

    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    mngr.save(0, {"trainable": jax.tree.map(np.asarray, state.trainable),
                  "opt_state": jax.tree.map(np.asarray, state.opt_state),
                  "step": int(state.step), "epoch": 0},
              metrics={"best_metric": 0.5})
    mngr.save(1, {"trainable": jax.tree.map(np.asarray, state.trainable),
                  "opt_state": jax.tree.map(np.asarray, state.opt_state),
                  "step": int(state.step), "epoch": 1},
              metrics={"best_metric": 0.9})

    assert mngr.latest_step() == 1
    assert mngr.best_step() == 1
    payload = mngr.restore(template={
        "trainable": state.trainable, "opt_state": state.opt_state,
        "step": 0, "epoch": 0})
    np.testing.assert_allclose(
        np.asarray(payload["trainable"]["a_proj"]["linear"]["kernel"]),
        np.asarray(state.trainable["a_proj"]["linear"]["kernel"]))
    # adam momentum restored
    restored_mu = jax.tree_util.tree_leaves(payload["opt_state"])
    current_mu = jax.tree_util.tree_leaves(state.opt_state)
    for a, b in zip(restored_mu, current_mu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_metrics_doubt_class_exclusion():
    """add_doubt_cls: doubt-targeted items are excluded from tolerance
    accuracy (ref: train_utils.py:684-691)."""
    from synchformer_tpu.train.metrics import calc_cls_metrics

    targets = np.array([0, 1, 21, 21])  # last class (21) = doubt
    logits = np.zeros((4, 22), dtype=np.float32)
    logits[0, 0] = 9.0   # exact
    logits[1, 2] = 9.0   # off by one
    logits[2, 21] = 9.0  # doubt predicted correctly (excluded from tol)
    logits[3, 5] = 9.0
    m = calc_cls_metrics(targets, logits, topk=(1,), only_accuracy=True,
                         add_doubt_cls=True)
    # only the two non-doubt items count for tolerance; both are within ±1
    assert m["accuracy_1_tol1"] == pytest.approx(1.0, abs=1e-4)
    assert m["accuracy_1"] == pytest.approx(0.5)  # items 0 and 2 hit exactly
