"""SPMD tests on the 8-device virtual CPU mesh: sharded train step, TP param
layout, gradient-psum equivalence with single-device training, AVCLIP
all-gather negatives."""
import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synchformer_tpu.models.sync_model import Synchformer
from synchformer_tpu.models.avclip import AVCLIP
from synchformer_tpu.parallel.mesh import (
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from synchformer_tpu.train.state import SyncTrainState, make_optimizer
from synchformer_tpu.train.step import make_sync_train_step

from tests.test_models import TINY_AUD, TINY_PROJ, TINY_TRANSFORMER, TINY_VIS, D


def _tiny_model():
    return Synchformer(afeat_extractor=TINY_AUD, vfeat_extractor=TINY_VIS,
                       aproj=TINY_PROJ, vproj=TINY_PROJ, transformer=TINY_TRANSFORMER)


def _batch(rng, b):
    return {
        "vis": jnp.asarray(rng.standard_normal((b, 3, 4, 16, 16, 3)).astype(np.float32)),
        "aud": jnp.asarray(rng.standard_normal((b, 3, 14, 20)).astype(np.float32)),
        "targets": jnp.asarray(rng.integers(0, 21, b), dtype=jnp.int32),
    }


def test_dp_training_step_matches_single_device(rng):
    """DP-sharded step == unsharded step (the psum IS the gradient mean)."""
    model = _tiny_model()
    batch = _batch(rng, 8)
    params = model.init(jax.random.PRNGKey(0), batch["vis"], batch["aud"])["params"]
    # sgd with lr=1: new_params - params == -grad, so this compares the
    # DP-psum'd gradient directly (adam's rsqrt would amplify reduction-order
    # float noise into meaningless relative diffs)
    tx = make_optimizer("sgd", lr=1.0, max_clip_norm=None)

    step = make_sync_train_step(model, donate=False)
    key = jax.random.PRNGKey(7)

    # single device
    state1 = SyncTrainState.create(params, tx)
    new1, m1 = step(state1, batch, key)

    # 8-way data parallel
    mesh = make_mesh(n_data=8, n_model=1)
    shardings = param_shardings(params, mesh)
    params_sharded = jax.tree.map(jax.device_put, params, shardings)
    state8 = SyncTrainState.create(params_sharded, tx)
    bs = batch_sharding(mesh)
    batch8 = {k: jax.device_put(v, bs) for k, v in batch.items()}
    new8, m8 = step(state8, batch8, jax.device_put(key, replicated(mesh)))

    assert np.isfinite(float(m8["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # updated trainable params agree
    flat1 = jax.tree_util.tree_leaves(new1.trainable)
    flat8 = jax.tree_util.tree_leaves(new8.trainable)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-6)


def test_tp_sharding_applies_and_runs(rng):
    """4x2 (data x model) mesh: kernels actually get TP-sharded and a step runs."""
    model = _tiny_model()
    batch = _batch(rng, 8)
    params = model.init(jax.random.PRNGKey(0), batch["vis"], batch["aud"])["params"]
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = param_shardings(params, mesh)

    specs = jax.tree_util.tree_leaves(
        jax.tree.map(lambda s: s.spec, shardings,
                     is_leaf=lambda x: hasattr(x, "spec")))
    assert any(MODEL_AXIS in str(s) for s in specs), "no TP-sharded params found"

    params_sharded = jax.tree.map(jax.device_put, params, shardings)
    tx = make_optimizer("adam", lr=1e-3)
    state = SyncTrainState.create(params_sharded, tx)
    bs = batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    step = make_sync_train_step(model, donate=False)
    new_state, metrics = step(state, batch_sh, jax.device_put(
        jax.random.PRNGKey(0), replicated(mesh)))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_avclip_gathered_negatives_match_global_batch(rng):
    """shard_map all_gather InfoNCE == single-device loss on the global batch."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    vis_cfg = dict(TINY_VIS, params=dict(TINY_VIS["params"],
                                         agg_time_module="AveragePooling"))
    aud_cfg = dict(TINY_AUD, params=dict(TINY_AUD["params"],
                                         agg_time_module="AveragePooling"))
    nothing = dict(target="synchformer_tpu.models.bridges.DoNothingBridge", params={})
    model = AVCLIP(n_embd=D, afeat_extractor=aud_cfg, vfeat_extractor=vis_cfg,
                   aproj=nothing, vproj=nothing, gather_for_loss=True)
    b = 8
    vis = jnp.asarray(rng.standard_normal((b, 2, 4, 16, 16, 3)).astype(np.float32))
    aud = jnp.asarray(rng.standard_normal((b, 2, 14, 20)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), vis, aud)["params"]

    # global-batch loss, no gathering
    ref_model = model.clone(gather_for_loss=False)
    out = ref_model.apply({"params": params}, vis, aud)
    ref_loss = float(out["losses"]["segment_contrastive_loss"])

    mesh = make_mesh(n_data=4, n_model=1)

    @jax.jit
    def sharded_loss(params, vis, aud):
        def inner(vis, aud):
            o = model.apply({"params": params}, vis, aud, axis_name="data")
            return jax.lax.pmean(o["losses"]["segment_contrastive_loss"], "data")

        return shard_map(inner, mesh=mesh, in_specs=(P("data"), P("data")),
                         out_specs=P())(vis, aud)

    got = float(sharded_loss(params, vis, aud))
    np.testing.assert_allclose(got, ref_loss, rtol=1e-5)


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8, full_dims=False)


@pytest.mark.slow
def test_graft_entry_dryrun_full_dims():
    """The driver's exact invocation: the REAL tower dims (d=768, depth 12,
    12 heads — production TP-sharded kernel shapes) at tiny spatial extents,
    one full Stage-II train step on the 4x2 ('data','model') mesh."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_pallas_step_under_sharded_mesh_matches_xla(rng):
    """The pallas kernels (custom VJP) composed with the data-sharded jitted
    train step — the exact combination pod-scale Stage-I training uses — give
    the same updated params as the XLA attention path. Towers are put in the
    trainable set so the pallas BACKWARD kernels run under the mesh."""
    from jax.experimental.pallas import tpu as pltpu

    from synchformer_tpu.parallel.mesh import set_active_data_mesh

    mesh = make_mesh()  # every device on 'data'
    set_active_data_mesh(mesh)  # pallas entry points shard_map over 'data'
    batch_host = _batch(rng, 8)

    def tiny(attn_impl):
        aud = dict(TINY_AUD, params=dict(TINY_AUD["params"], attn_impl=attn_impl))
        vis = dict(TINY_VIS, params=dict(TINY_VIS["params"], attn_impl=attn_impl))
        return Synchformer(afeat_extractor=aud, vfeat_extractor=vis,
                           aproj=TINY_PROJ, vproj=TINY_PROJ,
                           transformer=TINY_TRANSFORMER)

    model_x, model_p = tiny("xla"), tiny("pallas")
    params = model_x.init(jax.random.PRNGKey(0),
                          batch_host["vis"], batch_host["aud"])["params"]
    shardings = param_shardings(params, mesh)
    params = jax.tree.map(jax.device_put, params, shardings)
    bs = batch_sharding(mesh)
    batch = {k: jax.device_put(v, bs) for k, v in batch_host.items()}
    step_rng = jax.device_put(jax.random.PRNGKey(1), replicated(mesh))

    # sgd lr=1: updated params expose the (psum'd) gradients directly
    tx = make_optimizer("sgd", lr=1.0, max_clip_norm=None)
    all_keys = tuple(params.keys())  # towers trainable -> pallas bwd runs

    def run(model):
        state = SyncTrainState.create(params, tx, trainable_keys=all_keys)
        step = make_sync_train_step(model, donate=False,
                                    extractors_deterministic=True)
        new_state, metrics = step(state, batch, step_rng)
        assert bool(metrics["loss_finite"])
        return jax.tree.map(np.asarray, new_state.trainable)

    got_x = run(model_x)
    with pltpu.force_tpu_interpret_mode():
        got_p = run(model_p)

    for (path, px), (_, pp) in zip(
            jax.tree_util.tree_leaves_with_path(got_x),
            jax.tree_util.tree_leaves_with_path(got_p)):
        np.testing.assert_allclose(pp, px, rtol=1e-3, atol=1e-4,
                                   err_msg=str(path))


def test_dryrun_multichip_pallas_entry():
    """__graft_entry__.dryrun_multichip with the pallas attention path: the
    full train step (pallas fwd + custom-VJP bwd in interpret mode) compiles
    and executes one step on the 8-device mesh.

    Runs in a FRESH subprocess: interpret mode drives millions of
    io_callbacks, and inside the long-lived suite process (6+ GB of live
    objects by this point) CPython GC slows them ~10x — the step that takes
    ~75 s in isolation blew past the 600 s collective rendezvous timeout and
    SIGABRTed the whole suite (seen twice). Isolation also matches how the
    driver invokes it."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # keep the axon plugin out; dryrun forces cpu
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8, attn_impl='pallas')"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout + proc.stderr
