"""Orbax checkpoint manager: full-payload save/restore round trip + best-step
semantics."""
import jax
import jax.numpy as jnp
import numpy as np
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
    def payload_at(epoch):
        return {"trainable": jax.tree.map(np.asarray, state.trainable),
                "opt_state": jax.tree.map(np.asarray, state.opt_state),
                "step": int(state.step), "epoch": epoch}
    mngr.save_latest(0, payload_at(0))
    mngr.save_best(0, payload_at(0), metrics={"best_metric": 0.5})
    mngr.save_latest(1, payload_at(1))
    mngr.save_best(1, payload_at(1), metrics={"best_metric": 0.9})

    assert mngr.latest_step() == 1
    assert mngr.best_step() == 1
    payload = mngr.restore_latest(template={
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


def test_latest_and_best_stores_are_independent(tmp_path):
    """latest saved every epoch regardless of metric; best only on
    improvement (ref cadence: train_sync.py:257-267)."""
    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    mngr.save_latest(0, {"epoch": 0, "x": 1.0})
    mngr.save_best(0, {"epoch": 0, "x": 1.0},
                   metrics={"best_metric": 0.9})
    # epochs 1-2: metric got worse -> only latest advances
    mngr.save_latest(1, {"epoch": 1, "x": 2.0})
    mngr.save_latest(2, {"epoch": 2, "x": 3.0})
    assert mngr.latest_step() == 2
    assert mngr.best_step() == 0
    latest = mngr.restore_latest(template={"epoch": 0, "x": 0.0})
    best = mngr.restore_best(template={"epoch": 0, "x": 0.0})
    assert int(latest["epoch"]) == 2 and float(latest["x"]) == 3.0
    assert int(best["epoch"]) == 0 and float(best["x"]) == 1.0


def test_merge_params_nonstrict():
    """Non-strict finetune merge: fresh heads kept, ckpt-only keys dropped,
    shape mismatches kept fresh (ref: train_sync.py:68-82 strict=False)."""
    from synchformer_tpu.utils.checkpoint import merge_params_nonstrict

    init = {"sync_transformer": {"blocks_0": {"w": np.zeros((4, 4))},
                                 "sync_head": {"kernel": np.zeros((4, 2))},
                                 "off_head": {"kernel": np.zeros((4, 21))}}}
    loaded = {"sync_transformer": {"blocks_0": {"w": np.ones((4, 4))},
                                   "off_head": {"kernel": np.full((4, 21), 2.0)},
                                   "extra": {"w": np.ones((3,))}}}
    merged, report = merge_params_nonstrict(init, loaded)
    np.testing.assert_array_equal(merged["sync_transformer"]["blocks_0"]["w"],
                                  np.ones((4, 4)))
    # off_head shapes match -> loaded; sync_head missing -> fresh
    np.testing.assert_array_equal(merged["sync_transformer"]["off_head"]["kernel"],
                                  np.full((4, 21), 2.0))
    np.testing.assert_array_equal(merged["sync_transformer"]["sync_head"]["kernel"],
                                  np.zeros((4, 2)))
    assert report["missing"] == ["sync_transformer.sync_head"]
    assert report["unexpected"] == ["sync_transformer.extra"]
    # shape mismatch keeps fresh value
    loaded2 = {"sync_transformer": {"blocks_0": {"w": np.ones((8, 8))}}}
    merged2, report2 = merge_params_nonstrict(init, loaded2)
    np.testing.assert_array_equal(merged2["sync_transformer"]["blocks_0"]["w"],
                                  np.zeros((4, 4)))
    assert len(report2["mismatched"]) == 1


def test_trim_sync_pos_emb():
    """Pos-emb trim rule (ref: model/sync_model.py:101-114): longer ckpt is
    trimmed, shorter raises."""
    from synchformer_tpu.utils.checkpoint import trim_sync_pos_emb

    params = {"sync_transformer": {"pos_emb": {"pos_emb": np.arange(198)
                                               .reshape(1, 198, 1).astype(np.float32)}}}
    out = trim_sync_pos_emb(params, 184)
    assert out["sync_transformer"]["pos_emb"]["pos_emb"].shape == (1, 184, 1)
    np.testing.assert_array_equal(
        out["sync_transformer"]["pos_emb"]["pos_emb"][0, :, 0], np.arange(184))
    with pytest.raises(ValueError):
        trim_sync_pos_emb(params, 200)
    # no-op cases
    assert trim_sync_pos_emb(params, None)["sync_transformer"] is params["sync_transformer"]
    assert trim_sync_pos_emb({"sync_transformer": {}}, 184) == {"sync_transformer": {}}


def test_early_stopper_state_roundtrip():
    from synchformer_tpu.utils.logger import EarlyStopper

    s = EarlyStopper(patience=3, to_max=True)
    s.update(0.5)
    s.update(0.4)  # worse -> count=1
    sd = s.state_dict()
    assert sd == {"best": 0.5, "count": 1}
    s2 = EarlyStopper(patience=3, to_max=True)
    s2.load_state_dict(sd)
    assert s2.best == 0.5 and s2.count == 1 and not s2.triggered
    assert not s2.update(0.45)  # still worse -> count=2
    assert s2.count == 2


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


def test_restored_payload_recommits_to_mesh(tmp_path, rng):
    """Regression: orbax restores leaves whose template was an uncommitted
    scalar (optax ``count``) COMMITTED to the default device; next to the
    mesh-sharded params, jit then fails with "Received incompatible devices
    for jitted computation". ``commit_to_mesh`` must land every restored leaf
    on the mesh (replicating what isn't already laid out on it)."""
    from jax.sharding import NamedSharding

    from synchformer_tpu.parallel.mesh import (
        commit_to_mesh,
        make_mesh,
        param_shardings,
    )

    mesh = make_mesh()
    params = {"a_proj": {"linear": {
        "kernel": jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32)),
        "bias": jnp.zeros((8,))}}}
    params = jax.tree.map(jax.device_put, params, param_shardings(params, mesh))
    tx = make_optimizer("adam", lr=1e-3)  # chain incl. clip -> count scalars
    state = SyncTrainState.create(params, tx, trainable_keys=("a_proj",))

    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    mngr.save_latest(0, {"trainable": jax.tree.map(np.asarray, state.trainable),
                         "opt_state": jax.tree.map(np.asarray, state.opt_state),
                         "step": 3, "epoch": 0})
    payload = mngr.restore_latest(template={
        "trainable": state.trainable, "opt_state": state.opt_state,
        "step": 0, "epoch": 0})

    # the raw restore is mixed-committed (this is the orbax behavior the
    # helper exists for) ...
    raw_devsets = {tuple(sorted(d.id for d in leaf.sharding.device_set))
                   for leaf in jax.tree.leaves(payload["opt_state"])
                   if hasattr(leaf, "sharding")}
    assert len(raw_devsets) > 1, raw_devsets
    # ... and commit_to_mesh heals it without touching values
    fixed = commit_to_mesh(payload["opt_state"], mesh)
    for leaf, ref_leaf in zip(jax.tree.leaves(fixed),
                              jax.tree.leaves(state.opt_state)):
        assert isinstance(leaf.sharding, NamedSharding)
        assert leaf.sharding.mesh == mesh
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref_leaf))
    step = commit_to_mesh(jnp.asarray(int(payload["step"]), jnp.int32), mesh)
    assert int(step) == 3 and step.sharding.mesh == mesh
