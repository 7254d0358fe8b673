"""Jitted SPMD train/eval steps — the ONE implementation both trainers and
the test-suite consume.

One compiled program per step: (optional fused device preprocess: uint8
frames + raw PCM -> normalized model inputs), forward (frozen towers in eval
mode), loss, gradients w.r.t. the trainable subtree only, clip, optimizer
update. Under a ('data','model') mesh with batch sharded on 'data' and params
replicated (or TP-sharded), XLA inserts the gradient psum automatically — the
TPU-native equivalent of DDP's bucketed all-reduce (SURVEY.md §2.4).

`preprocess(raw_batch, train, rng) -> (vis, aud)` lets the trainers fuse the
device-side mel/video pipeline into the same XLA program (the reference does
all of this per CPU worker); without it the step consumes pre-computed
batch["vis"]/batch["aud"] (unit tests, __graft_entry__).

Loss-finiteness is returned in metrics; the host-side trainer raises on
non-finite loss like the reference (ref: scripts/train_sync.py:188-190).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from synchformer_tpu.train.state import SyncTrainState, merge_params


def _inputs(batch, preprocess, train: bool, rng):
    if preprocess is not None:
        return preprocess(batch, train=train, rng=rng)
    return batch["vis"], batch["aud"]


def make_sync_train_step(model, preprocess: Optional[Callable] = None,
                         target_key: str = "targets", donate: bool = True,
                         extractors_deterministic: bool = True):
    """Stage II/III training step for `Synchformer`.

    batch: dict(vis=(B,S,T,H,W,C), aud=(B,S,T',F), targets=(B,)) — or the
    raw loader batch (video/audio/<target_key>) when `preprocess` is given.

    `extractors_deterministic=True` is the frozen-tower default (towers stay
    in eval mode while the sync transformer trains, ref:
    scripts/train_utils.py:330-344); pass False when the config marks the
    extractors `is_trainable` so their dropout/drop-path follow train mode
    and gradients flow through them (they are in `state.trainable` then).
    """

    def train_step(state: SyncTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        prep_rng, model_rng = jax.random.split(rng)
        vis, aud = _inputs(batch, preprocess, train=True, rng=prep_rng)
        targets = batch[target_key]

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            loss, logits = model.apply(
                {"params": params}, vis, aud, targets,
                deterministic=False,
                extractors_deterministic=extractors_deterministic,
                rngs={"dropout": model_rng,
                      "droppath": jax.random.fold_in(model_rng, 1)},
            )
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable)
        new_state, _ = state.apply_gradients(grads)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "accuracy_1": (jnp.argmax(logits, -1) == targets).mean(),
            "loss_finite": jnp.isfinite(loss),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_sync_eval_step(model, preprocess: Optional[Callable] = None,
                        target_key: str = "targets"):
    """Eval step: f32 logits + per-example CE (host aggregates/gathers)."""

    def eval_step(trainable, frozen, batch):
        vis, aud = _inputs(batch, preprocess, train=False, rng=None)
        params = merge_params(trainable, frozen)
        _, logits = model.apply({"params": params}, vis, aud,
                                deterministic=True)
        logits = logits.astype(jnp.float32)
        targets = batch[target_key]
        loss_vec = optax.softmax_cross_entropy_with_integer_labels(
            logits, targets)
        return {"logits": logits, "loss_vec": loss_vec, "targets": targets}

    return jax.jit(eval_step)


def make_avclip_train_step(model, preprocess: Optional[Callable] = None,
                           axis_name: Optional[str] = None,
                           donate: bool = True):
    """Stage I training step for `AVCLIP` (all params trainable; logit scale
    clamped after every update, ref: open_clip/model.py:579-582)."""

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        prep_rng, model_rng = jax.random.split(rng)
        vis, aud = _inputs(batch, preprocess, train=True, rng=prep_rng)

        def loss_fn(params):
            out = model.apply(
                {"params": params}, vis, aud,
                deterministic=False, axis_name=axis_name,
                rngs={"dropout": model_rng,
                      "droppath": jax.random.fold_in(model_rng, 1)},
            )
            return out["losses"]["segment_contrastive_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
        new_state, _ = state.apply_gradients(grads)
        # clamp the temperature parameter in-place after the update
        clamped = jnp.clip(new_state.trainable["logit_scale"],
                           model.clamp_scale_min, model.clamp_scale_max)
        new_state = new_state.replace(
            trainable={**new_state.trainable, "logit_scale": clamped})
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "logit_scale": clamped,
            "loss_finite": jnp.isfinite(loss),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_moco_train_step(model, preprocess: Optional[Callable] = None,
                         donate: bool = True):
    """Stage I training step for `MultilevelMoCoCLIP`
    (ref: open_clip/model.py:585-871 + training/train.py:110-130).

    MoCo state (EMA params + feature queues) is an explicit pytree threaded
    through the step — the torch version hides it in buffers mutated under
    no_grad. Order per step: query/key forward, loss vs [keys | queues],
    grads w.r.t. the online params only, optimizer update, EMA update from
    the UPDATED online params, queue roll. `alpha` is the ALBEF soft-target
    weight (ramped over epoch 0 by the trainer, ref: train.py:115).
    """
    from synchformer_tpu.models.moco_clip import moco_forward, momentum_update

    def train_step(state, moco, batch, rng, alpha):
        rng = jax.random.fold_in(rng, state.step)
        prep_rng, model_rng = jax.random.split(rng)
        vis, aud = _inputs(batch, preprocess, train=True, rng=prep_rng)

        # EMA update FIRST, from the pre-step online params; keys come from
        # the freshly-updated momentum encoders (ref: model.py:656-660)
        new_params_m = momentum_update(state.trainable, moco["params_m"],
                                       model.momentum)

        def loss_fn(params):
            losses, new_queues, _ = moco_forward(
                model, params, new_params_m, moco["queues"], vis, aud,
                rngs={"dropout": model_rng,
                      "droppath": jax.random.fold_in(model_rng, 1)},
                alpha=alpha, train=True)
            total = sum(losses.values())
            return total, (losses, new_queues)

        (loss, (losses, new_queues)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)
        new_state, _ = state.apply_gradients(grads)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                   "loss_finite": jnp.isfinite(loss),
                   **{k: v for k, v in losses.items()}}
        return new_state, {"params_m": new_params_m, "queues": new_queues}, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_moco_eval_step(model, zero_shot_precision_fn,
                        preprocess: Optional[Callable] = None):
    """MoCo eval: loss vs the frozen queues (no enqueue) + the zero-shot
    shifted-window probe on the query tower's segment features."""
    from synchformer_tpu.models.moco_clip import moco_forward

    def eval_step(params, moco, batch, window: int):
        vis, aud = _inputs(batch, preprocess, train=False, rng=None)
        losses, _, out = moco_forward(model, params, moco["params_m"],
                                      moco["queues"], vis, aud,
                                      alpha=0.0, train=False)
        b, s = vis.shape[0], vis.shape[1]
        vfeat = out["segment_vfeat"].reshape(b, s, -1).astype(jnp.float32)
        afeat = out["segment_afeat"].reshape(b, s, -1).astype(jnp.float32)
        precision = zero_shot_precision_fn(afeat, vfeat, window)
        return {"loss": sum(losses.values()), "precision": precision,
                "afeat": afeat, "vfeat": vfeat}

    return jax.jit(eval_step, static_argnums=(3,))


def make_avclip_eval_step(model, zero_shot_precision_fn,
                          preprocess: Optional[Callable] = None):
    """Stage I eval step: contrastive loss + the zero-shot shifted-window
    retrieval probe (ref: training/train.py:261-402,549-592)."""

    def eval_step(params, batch, window: int):
        vis, aud = _inputs(batch, preprocess, train=False, rng=None)
        out = model.apply({"params": params}, vis, aud, deterministic=True)
        b = vis.shape[0]
        vfeat = out["rgb_features"][0].reshape(b, -1, model.n_embd)
        afeat = out["audio_features"][0].reshape(b, -1, model.n_embd)
        precision = zero_shot_precision_fn(afeat.astype(jnp.float32),
                                           vfeat.astype(jnp.float32), window)
        return {"loss": out["losses"]["segment_contrastive_loss"],
                "precision": precision,
                "afeat": afeat.astype(jnp.float32),
                "vfeat": vfeat.astype(jnp.float32)}

    return jax.jit(eval_step, static_argnums=(2,))
