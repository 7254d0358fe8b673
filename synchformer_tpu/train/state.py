"""Training state, optimizers, LR schedules.

Capability parity with ref: scripts/train_utils.py:217-248 (adam/adamw/sgd
with constant / constant-with-warmup LR, learning rate scaled by the
data-parallel world size) and train_clip_src/training/scheduler.py:13-53
(cosine / const / const-cooldown for Stage I).

TPU-native: a single frozen/trainable split of the param pytree; gradients
are computed ONLY w.r.t. the trainable subtree (the reference wastes backward
FLOPs through frozen towers and relies on requires_grad=False; here the
towers are simply not differentiated — they sit upstream of the trainable
projections, so no cotangents are needed at all).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

# Stage II/III trainable subtrees (ref: configs/sync.yaml:7,19 —
# extractors is_trainable: False; projections + transformer train)
SYNC_TRAINABLE_KEYS = ("a_proj", "v_proj", "sync_transformer")


def split_params(params, trainable_keys=SYNC_TRAINABLE_KEYS):
    """Split a top-level param dict into (trainable, frozen) dicts."""
    params = flax.core.unfreeze(params)
    trainable = {k: v for k, v in params.items() if k in trainable_keys}
    frozen = {k: v for k, v in params.items() if k not in trainable_keys}
    return trainable, frozen


def merge_params(trainable, frozen):
    return {**frozen, **trainable}


def _ref_warmup(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """The reference's warmup ramp: lr(s) = base * (s + 1) / warmup
    (ref: training/scheduler.py:9-10, exact including the +1)."""
    return optax.linear_schedule(base_lr / warmup_steps, base_lr,
                                 max(warmup_steps - 1, 1))


def make_lr_schedule(name: str, base_lr: float, warmup_steps: int = 0,
                     total_steps: Optional[int] = None,
                     cooldown_steps: Optional[int] = None,
                     cooldown_power: float = 1.0,
                     cooldown_end: float = 0.0) -> optax.Schedule:
    """LR schedules, step-exact vs the reference (golden:
    tests/test_reference_golden.py::test_lr_schedule_golden):
    - 'constant' / 'constant_with_warmup' (ref: train_utils.py:238-248; warmup
      linearly recovers from base_lr/100 over `warmup_steps`)
    - 'cosine' with the reference's (s+1)/warmup linear warmup
      (Stage I, ref: training/scheduler.py:43-53)
    - 'const-cooldown' with polynomial cooldown over the last
      `cooldown_steps` (ref: training/scheduler.py:24-40)
    """
    if name == "constant":
        return optax.constant_schedule(base_lr)
    if name == "const":  # Stage-I 'const': ref warmup then flat
        # ref: training/scheduler.py:13-21
        if warmup_steps <= 0:
            return optax.constant_schedule(base_lr)
        return optax.join_schedules(
            [_ref_warmup(base_lr, warmup_steps),
             optax.constant_schedule(base_lr)], [warmup_steps])
    if name == "constant_with_warmup":
        warm = optax.linear_schedule(base_lr / 100.0, base_lr, warmup_steps)
        return optax.join_schedules([warm, optax.constant_schedule(base_lr)],
                                    [warmup_steps])
    if name == "cosine":
        assert total_steps is not None
        cos = optax.cosine_decay_schedule(base_lr,
                                          max(total_steps - warmup_steps, 1))
        if warmup_steps <= 0:
            return cos
        return optax.join_schedules([_ref_warmup(base_lr, warmup_steps), cos],
                                    [warmup_steps])
    if name == "const-cooldown":
        assert total_steps is not None
        cd = cooldown_steps if cooldown_steps is not None else total_steps // 5
        cool = optax.polynomial_schedule(base_lr, cooldown_end, cooldown_power,
                                         max(cd, 1))
        segs = [optax.constant_schedule(base_lr), cool]
        bounds = [total_steps - cd]
        if warmup_steps > 0:
            segs.insert(0, _ref_warmup(base_lr, warmup_steps))
            bounds.insert(0, warmup_steps)
        return optax.join_schedules(segs, bounds)
    raise ValueError(f"unknown lr schedule {name!r}")


def make_optimizer(name: str = "adam", lr: Any = 2e-6, betas=(0.9, 0.999),
                   momentum: float = 0.9, weight_decay: float = 0.0,
                   max_clip_norm: Optional[float] = 1.0,
                   weight_decay_mask=None,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """adam/adamw/sgd + global-norm clipping (ref: train_utils.py:217-235,
    373-386; clip 1.0 per configs/sync.yaml:78). The reference raises eps to
    1e-7 under half precision (ref: train_utils.py:223) — callers pass it."""
    if name == "adam":
        tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "adamw":
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                         weight_decay=weight_decay, mask=weight_decay_mask)
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if max_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_clip_norm), tx)
    return tx


def adamw_no_decay_mask(params):
    """Stage I decay exemption: no weight decay for biases and 1-D gains
    (ref: train_clip.py:267-278 exclude_from_wd on ndim<2 / bn / bias)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


@flax.struct.dataclass
class SyncTrainState:
    """Trainable/frozen split train state for the sync model."""

    step: jnp.ndarray
    trainable: Any
    frozen: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx, trainable_keys=SYNC_TRAINABLE_KEYS) -> "SyncTrainState":
        trainable, frozen = split_params(params, trainable_keys)
        return cls(step=jnp.zeros((), jnp.int32), trainable=trainable, frozen=frozen,
                   opt_state=tx.init(trainable), tx=tx)

    def apply_gradients(self, grads) -> Tuple["SyncTrainState", Any]:
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.trainable)
        new_trainable = optax.apply_updates(self.trainable, updates)
        return self.replace(step=self.step + 1, trainable=new_trainable,
                            opt_state=new_opt_state), updates

    @property
    def params(self):
        return merge_params(self.trainable, self.frozen)
