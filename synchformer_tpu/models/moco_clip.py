"""MultilevelMoCoCLIP: MoCo-style Stage-I model (momentum encoders + queues).

Capability parity with ref: open_clip/model.py:585-883 — the alternative
Stage-I contrastive model:

- momentum (EMA) copies of both towers + projections provide the keys
- feature QUEUES extend the negative set beyond the batch (segment queue
  scaled by max_segments, optional global queue)
- ALBEF-style alpha: soft targets interpolate the one-hot diagonal with the
  momentum model's similarity softmax (ref: model.py:703-717)
- temperature is a direct divisor, clamped every step, one scale per level

JAX re-design: the torch version hides EMA params and queues in module
buffers mutated in-place under no_grad. Here they are explicit state — a
``MoCoState`` pytree threaded through a jitted train step: EMA update, key
encoding under stop_gradient, queue roll via dynamic_update_slice. Same math,
no hidden mutation, trivially SPMD (queues replicate; key gathering across
the data axis mirrors concat_all_gather, ref: model.py:873-883).
"""
from __future__ import annotations

from typing import Any, Mapping, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from synchformer_tpu.registry import instantiate_from_config, register


def _l2norm(x, axis=-1):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x / jnp.maximum(n, 1e-12).astype(x.dtype)).astype(x.dtype)


@register("synchformer_tpu.models.moco_clip.MultilevelMoCoCLIP",
          "model.modules.feat_extractors.train_clip_src.open_clip.model.MultilevelMoCoCLIP")
class MultilevelMoCoCLIP(nn.Module):
    n_embd: int
    queue_size: int
    momentum: float
    afeat_extractor: Mapping[str, Any]
    vfeat_extractor: Mapping[str, Any]
    aproj: Mapping[str, Any]
    vproj: Mapping[str, Any]
    init_scale: float = 0.07
    clamp_scale_min: float = 0.001
    clamp_scale_max: float = 0.5

    @property
    def add_global_repr(self) -> bool:
        return bool(self.afeat_extractor.get("params", {}).get("add_global_repr", False))

    def setup(self):
        self.v_encoder = instantiate_from_config(self.vfeat_extractor)
        self.a_encoder = instantiate_from_config(self.afeat_extractor)
        self.segment_aproj = instantiate_from_config(self.aproj)
        self.segment_vproj = instantiate_from_config(self.vproj)
        init = lambda key: jnp.asarray(self.init_scale, jnp.float32)
        self.segment_logit_scale = self.param("segment_logit_scale", init)
        if self.add_global_repr:
            self.global_aproj = instantiate_from_config(self.aproj)
            self.global_vproj = instantiate_from_config(self.vproj)
            self.global_logit_scale = self.param("global_logit_scale", init)

    def scales(self) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        seg = jnp.clip(self.segment_logit_scale, self.clamp_scale_min,
                       self.clamp_scale_max)
        glob = (jnp.clip(self.global_logit_scale, self.clamp_scale_min,
                         self.clamp_scale_max) if self.add_global_repr else None)
        return seg, glob

    def __call__(self, vis, aud, deterministic: bool = True):
        """Single forward (query OR key depending on the params passed in).
        Returns segment (B*S, D) + global (B, D)|None normalized features."""
        seg_v, glob_v = self.v_encoder(vis, deterministic=deterministic)
        seg_a, glob_a = self.a_encoder(aud, deterministic=deterministic)
        b, s, d = seg_v.shape
        seg_v = _l2norm(self.segment_vproj(seg_v.reshape(b * s, d)))
        seg_a = _l2norm(self.segment_aproj(seg_a.reshape(b * s, d)))
        out = {"segment_vfeat": seg_v, "segment_afeat": seg_a,
               "global_vfeat": None, "global_afeat": None,
               "logit_scales": self.scales()}
        if self.add_global_repr:
            out["global_vfeat"] = _l2norm(self.global_vproj(glob_v))
            out["global_afeat"] = _l2norm(self.global_aproj(glob_a))
        return out


# ---------------------------------------------------------------------------
# functional MoCo machinery
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class MoCoQueues:
    segment_v: jnp.ndarray  # (D, Q_seg)
    segment_a: jnp.ndarray
    segment_ptr: jnp.ndarray
    global_v: Optional[jnp.ndarray] = None  # (D, Q_glob)
    global_a: Optional[jnp.ndarray] = None
    global_ptr: Optional[jnp.ndarray] = None


def init_queues(rng, n_embd: int, segment_queue_size: int,
                global_queue_size: Optional[int] = None) -> MoCoQueues:
    """Randn-init, L2-normalized along D (ref: model.py:862-871)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    seg_v = _l2norm(jax.random.normal(k1, (n_embd, segment_queue_size)), axis=0)
    seg_a = _l2norm(jax.random.normal(k2, (n_embd, segment_queue_size)), axis=0)
    q = MoCoQueues(segment_v=seg_v, segment_a=seg_a,
                   segment_ptr=jnp.zeros((), jnp.int32))
    if global_queue_size:
        q = q.replace(
            global_v=_l2norm(jax.random.normal(k3, (n_embd, global_queue_size)), axis=0),
            global_a=_l2norm(jax.random.normal(k4, (n_embd, global_queue_size)), axis=0),
            global_ptr=jnp.zeros((), jnp.int32))
    return q


def momentum_update(params, params_m, momentum: float):
    """EMA of every parameter (ref: model.py:824-828)."""
    return jax.tree.map(lambda p, pm: pm * momentum + p * (1.0 - momentum),
                        params, params_m)


def dequeue_and_enqueue(queue: jnp.ndarray, ptr: jnp.ndarray,
                        feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write the batch of keys at ptr, advance modulo the queue size
    (ref: model.py:839-857). Queue is (D, Q); feats (B, D); Q % B == 0."""
    batch = feats.shape[0]
    q_size = queue.shape[1]
    queue = jax.lax.dynamic_update_slice(queue, feats.T.astype(queue.dtype),
                                         (0, ptr))
    return queue, (ptr + batch) % q_size


def moco_contrastive_loss(vfeat, afeat, vfeat_all, afeat_all, scale,
                          alpha: float = 0.0, vfeat_m=None, afeat_m=None):
    """Symmetric InfoNCE vs [momentum keys | queue]; temperature divides the
    similarity; ALBEF soft targets when alpha > 0 (ref: model.py:694-721)."""
    sim_v2a = (vfeat @ afeat_all).astype(jnp.float32) / scale  # (B, B+Q)
    sim_a2v = (afeat @ vfeat_all).astype(jnp.float32) / scale
    n, m = sim_v2a.shape
    eye = jnp.eye(n, m, dtype=jnp.float32)
    # alpha may be a TRACED scalar (the trainer ramps it over epoch 0,
    # ref: training/train.py:115), so branch statically on whether momentum
    # feats were supplied; the formula reduces to one-hot at alpha == 0
    if vfeat_m is not None and afeat_m is not None:
        sim_v2a_m = jax.lax.stop_gradient(
            (vfeat_m @ afeat_all).astype(jnp.float32) / scale)
        sim_a2v_m = jax.lax.stop_gradient(
            (afeat_m @ vfeat_all).astype(jnp.float32) / scale)
        t_v2a = alpha * jax.nn.softmax(sim_v2a_m, -1) + (1 - alpha) * eye
        t_a2v = alpha * jax.nn.softmax(sim_a2v_m, -1) + (1 - alpha) * eye
    else:
        t_v2a = t_a2v = eye
    loss_v2a = optax.softmax_cross_entropy(sim_v2a, t_v2a).mean()
    loss_a2v = optax.softmax_cross_entropy(sim_a2v, t_a2v).mean()
    return (loss_v2a + loss_a2v) / 2.0


def moco_forward(model: MultilevelMoCoCLIP, params, params_m, queues: MoCoQueues,
                 vis, aud, rngs=None, alpha: float = 0.0,
                 train: bool = True):
    """One MoCo step's forward: query pass (grads), key pass (EMA params,
    stop_gradient), loss vs keys+queues, rolled queues. Returns (loss_dict,
    new_queues, out)."""
    out = model.apply({"params": params}, vis, aud, deterministic=not train,
                      rngs=rngs)
    out_m = jax.tree.map(jax.lax.stop_gradient, model.apply(
        {"params": params_m}, vis, aud, deterministic=True))

    seg_v_all = jnp.concatenate([out_m["segment_vfeat"].T, queues.segment_v], axis=1)
    seg_a_all = jnp.concatenate([out_m["segment_afeat"].T, queues.segment_a], axis=1)
    seg_scale, glob_scale = out["logit_scales"]
    losses = {
        "segment_contrastive_loss": moco_contrastive_loss(
            out["segment_vfeat"], out["segment_afeat"], seg_v_all, seg_a_all,
            seg_scale, alpha, out_m["segment_vfeat"], out_m["segment_afeat"])
    }
    if model.add_global_repr:
        g_v_all = jnp.concatenate([out_m["global_vfeat"].T, queues.global_v], axis=1)
        g_a_all = jnp.concatenate([out_m["global_afeat"].T, queues.global_a], axis=1)
        losses["global_contrastive_loss"] = moco_contrastive_loss(
            out["global_vfeat"], out["global_afeat"], g_v_all, g_a_all,
            glob_scale, alpha, out_m["global_vfeat"], out_m["global_afeat"])

    new_queues = queues
    if train and queues.segment_v.shape[1] > 0:
        qv, ptr = dequeue_and_enqueue(queues.segment_v, queues.segment_ptr,
                                      out_m["segment_vfeat"])
        qa, _ = dequeue_and_enqueue(queues.segment_a, queues.segment_ptr,
                                    out_m["segment_afeat"])
        new_queues = new_queues.replace(segment_v=qv, segment_a=qa, segment_ptr=ptr)
    if train and model.add_global_repr and queues.global_v is not None \
            and queues.global_v.shape[1] > 0:
        qv, ptr = dequeue_and_enqueue(queues.global_v, queues.global_ptr,
                                      out_m["global_vfeat"])
        qa, _ = dequeue_and_enqueue(queues.global_a, queues.global_ptr,
                                    out_m["global_afeat"])
        new_queues = new_queues.replace(global_v=qv, global_a=qa, global_ptr=ptr)
    return losses, new_queues, out
