"""AVCLIP: Stage-I segment-level audio-visual contrastive pre-training.

Capability parity with ref:
model/modules/feat_extractors/train_clip_src/open_clip/model.py:449-583 —

- two towers emitting per-segment features (B, S, D) (time-agg AveragePooling,
  configs/segment_avclip.yaml), flattened to (B*S, D), projected, L2-normed
- symmetric InfoNCE where the temperature is a direct DIVISOR of the
  similarity (``sim = v @ a.T / scale`` — the reference's unusual choice,
  ref: model.py:507-510), with the learnable scale clamped to
  [clamp_scale_min, clamp_scale_max] every step (ref: model.py:579-582)
- optional cross-replica negatives via a differentiable all_gather on the
  data mesh axis (ref: model.py:492-497 uses torch.distributed.nn.all_gather;
  here it is ``jax.lax.all_gather`` inside the SPMD program — differentiable
  by construction, rides ICI). NOTE: with gathering enabled we place each
  replica's positives on the rank-offset diagonal; the reference's dormant
  gather path puts them on the main diagonal for every rank, which is only
  correct on rank 0 — we implement the correct semantics.
"""
from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from synchformer_tpu.registry import instantiate_from_config, register


@register("synchformer_tpu.models.avclip.AVCLIP",
          "model.modules.feat_extractors.train_clip_src.open_clip.model.AVCLIP")
class AVCLIP(nn.Module):
    n_embd: int
    afeat_extractor: Mapping[str, Any]
    vfeat_extractor: Mapping[str, Any]
    aproj: Mapping[str, Any]
    vproj: Mapping[str, Any]
    init_scale: float = 0.07
    clamp_scale_min: float = 0.001
    clamp_scale_max: float = 0.5
    gather_for_loss: bool = False

    def setup(self):
        self.v_encoder = instantiate_from_config(self.vfeat_extractor)
        self.a_encoder = instantiate_from_config(self.afeat_extractor)
        self.a_proj = instantiate_from_config(self.aproj)
        self.v_proj = instantiate_from_config(self.vproj)
        self.logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(self.init_scale, dtype=jnp.float32))

    def scale(self) -> jnp.ndarray:
        return jnp.clip(self.logit_scale, self.clamp_scale_min, self.clamp_scale_max)

    def encode_stream(self, x, encoder, proj, deterministic: bool = True):
        feats, _ = encoder(x, deterministic=deterministic)  # (B, S, D)
        b, s, d = feats.shape
        feats = proj(feats.reshape(b * s, d))
        norm = jnp.linalg.norm(feats.astype(jnp.float32), axis=-1, keepdims=True)
        return (feats / jnp.maximum(norm, 1e-12).astype(feats.dtype)).astype(feats.dtype)

    def __call__(self, vis, aud, deterministic: bool = True,
                 axis_name: Optional[str] = None):
        """vis: (B, S, Tv, H, W, C); aud: (B, S, T_spec, F).

        Returns a dict with 'losses', 'rgb_features', 'audio_features',
        'logit_scales' mirroring the reference output (ref: model.py:499-505).
        """
        vfeat = self.encode_stream(vis, self.v_encoder, self.v_proj, deterministic)
        afeat = self.encode_stream(aud, self.a_encoder, self.a_proj, deterministic)

        scale = self.scale()
        if self.gather_for_loss and axis_name is not None:
            vfeat_all = jax.lax.all_gather(vfeat, axis_name).reshape(-1, vfeat.shape[-1])
            afeat_all = jax.lax.all_gather(afeat, axis_name).reshape(-1, afeat.shape[-1])
            rank = jax.lax.axis_index(axis_name)
            offset = rank * vfeat.shape[0]
        else:
            vfeat_all, afeat_all = vfeat, afeat
            offset = 0

        loss = self.contrastive_loss(vfeat, afeat, vfeat_all, afeat_all, scale, offset)
        return {
            "rgb_features": (vfeat, None),
            "audio_features": (afeat, None),
            "logit_scales": (scale, None),
            "losses": {"segment_contrastive_loss": loss},
        }

    def contrastive_loss(self, vfeat, afeat, vfeat_all, afeat_all, scale, offset=0):
        """Symmetric InfoNCE; temperature divides the similarity
        (ref: model.py:507-527)."""
        sim_v2a = (vfeat @ afeat_all.T).astype(jnp.float32) / scale
        sim_a2v = (afeat @ vfeat_all.T).astype(jnp.float32) / scale
        n = vfeat.shape[0]
        labels = jnp.arange(n) + offset
        loss_v2a = optax.softmax_cross_entropy_with_integer_labels(sim_v2a, labels).mean()
        loss_a2v = optax.softmax_cross_entropy_with_integer_labels(sim_a2v, labels).mean()
        return (loss_v2a + loss_a2v) / 2.0

    def similarity_matrices(self, vfeat, afeat):
        """v2a/a2v/v2v/a2a similarity heatmaps for logging
        (ref: model.py:553-571)."""
        scale = self.scale()
        return {
            "segment_sim_v2a": vfeat @ afeat.T / scale,
            "segment_sim_a2v": afeat @ vfeat.T / scale,
            "segment_sim_v2v": vfeat @ vfeat.T / scale,
            "segment_sim_a2a": afeat @ afeat.T / scale,
        }
