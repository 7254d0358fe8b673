"""Jitted SPMD train/eval steps.

One compiled program per step: forward (frozen towers in eval mode), loss,
gradients w.r.t. the trainable subtree only, clip, optimizer update. Under a
('data','model') mesh with batch sharded on 'data' and params replicated (or
TP-sharded), XLA inserts the gradient psum automatically — the TPU-native
equivalent of DDP's bucketed all-reduce (SURVEY.md §2.4).

Loss-finiteness is returned in metrics; the host-side trainer raises on
non-finite loss like the reference (ref: scripts/train_sync.py:188-190).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from synchformer_tpu.train.state import SyncTrainState, merge_params


def make_sync_train_step(model, donate: bool = True):
    """Stage II/III training step for `Synchformer`.

    batch: dict(vis=(B,S,T,H,W,C), aud=(B,S,T',F), targets=(B,))
    """

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        loss, logits = model.apply(
            {"params": params}, batch["vis"], batch["aud"], batch["targets"],
            deterministic=False, extractors_deterministic=True,
            rngs={"dropout": rng, "droppath": jax.random.fold_in(rng, 1)},
        )
        return loss, logits

    def train_step(state: SyncTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, batch, rng)
        new_state, _ = state.apply_gradients(grads)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "accuracy_1": (jnp.argmax(logits, -1) == batch["targets"]).mean(),
            "loss_finite": jnp.isfinite(loss),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_sync_eval_step(model):
    """Eval step: logits + per-example CE (host aggregates metrics/gathers)."""

    def eval_step(params, batch):
        _, logits = model.apply({"params": params}, batch["vis"], batch["aud"],
                                deterministic=True)
        logits = logits.astype(jnp.float32)
        loss_vec = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["targets"])
        return {"logits": logits, "loss_vec": loss_vec, "targets": batch["targets"]}

    return jax.jit(eval_step)


def make_avclip_train_step(model, axis_name: Optional[str] = None,
                           donate: bool = True):
    """Stage I training step for `AVCLIP` (all params trainable; logit scale
    clamped after every update, ref: open_clip/model.py:579-582)."""

    def loss_fn(params, batch, rng):
        out = model.apply(
            {"params": params}, batch["vis"], batch["aud"],
            deterministic=False, axis_name=axis_name,
            rngs={"dropout": rng, "droppath": jax.random.fold_in(rng, 1)},
        )
        return out["losses"]["segment_contrastive_loss"]

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.trainable, batch, rng)
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
