"""Motionformer video tower: divided space-time attention, TPU-native.

Re-designs the reference's Motionformer ViT-B
(ref: model/modules/feat_extractors/visual/motionformer_src/{video_model_builder,vit_helper}.py,
wrapped by visual/motionformer.py) for XLA:

- channels-last 3D patch embed (conv 2x16x16 -> 8x14x14 tokens + CLS = 1569)
- **divided attention** (ref: vit_helper.py:80-158): the CLS query attends to
  all 1569 keys; patch tokens attend within-frame (space) or within-position
  (time), with the CLS key/value broadcast into every group. Implemented as
  two dense batched attentions per block — XLA tiles the (B*S, H, groups, n)
  attention batches straight onto the MXU; no gather/scatter, no masking
  tricks, static shapes throughout.
- separate positional embeddings: spatial (197) tiled over frames + temporal
  (8) repeated over patches (ref: video_model_builder.py:246-254)
- segment axis folded into batch (ref: motionformer.py:209-215): the tower
  sees (B*S, 16, 224, 224, 3); `remat=True` wraps each block in
  jax.checkpoint, the TPU-native replacement for the reference's `for_loop`
  speed/memory mode (ref: motionformer.py:200-215).

Block ordering matches ref vit_helper.py:364-376 exactly: time-attention on
norm3 (residual WITHOUT drop-path), space-attention on norm1 (with
drop-path), MLP on norm2 (with drop-path).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from synchformer_tpu.models.aggregators import (
    AveragePooling,
    SpatialAggregator,
    TemporalAggregator,
)
from synchformer_tpu.models.layers import (
    DenseParams,
    DropPath,
    LNParams,
    MlpParams,
    exact_gelu,
)
from synchformer_tpu.ops.pallas.fused_block import dense, layer_norm
from synchformer_tpu.registry import register

_WARNED_PALLAS_MASK_FALLBACK = False


trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def _masked_softmax(logits: jnp.ndarray, keep: Optional[jnp.ndarray], out_dtype) -> jnp.ndarray:
    """Softmax over the last axis in fp32 with an optional boolean keep mask
    broadcastable to the logits' key axis."""
    logits = logits.astype(jnp.float32)
    if keep is not None:
        logits = jnp.where(keep, logits, jnp.finfo(jnp.float32).min)
    return jax.nn.softmax(logits, axis=-1).astype(out_dtype)


class DividedAttention(nn.Module):
    """One divided-attention call (space or time mode chosen by the caller).

    Given head-split q/k/v of shape (B, H, 1+F*N, Dh) with tokens ordered
    frame-major (position = f*N + n; matches torch's flatten of (D, t, h, w)),
    computes:
      - cls_out: CLS query over ALL keys
      - patch attention within groups of the regrouped axis, with CLS k/v
        prepended to every group (ref: vit_helper.py:116-150)
    """

    num_heads: int
    proj_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"  # 'xla' (reference path, differentiable) | 'pallas'
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, num_frames: int, mode: str, keep_mask=None,
                 deterministic: bool = True, ln=None, residual=None,
                 patch_ln_stats=None):
        """ln: optional (scale, bias) of the block's pre-attention LayerNorm.
        When given, x is the RAW block input and the normalization happens
        here — fused into the pallas megakernel on the pallas path, manual
        (identical numerics to nn.LayerNorm) otherwise.

        x may also be a (cls (B,1,D), patches (B,f,n,D)) TUPLE — the split
        layout that keeps the pallas kernels free of misaligned frame-slab
        relayouts (the tower drops CLS at the end, so nothing ever needs the
        concatenated sequence). Tuple in -> tuple out. Pallas-only path;
        callers fall back to the packed layout for keep-masks/XLA.

        residual: optional (cls, patches) tuple to ADD to the projected
        attention output — split/pallas path only, and only when the
        stochastic pieces (proj dropout / the caller's drop-path) are
        inactive. Fuses the output projection + residual add into the
        attention kernel epilogue (the raw attention output never
        round-trips to HBM) and returns the post-residual (cls, patches)."""
        if isinstance(x, tuple):
            x_cls, x_patch = x
            b, f, n, d = x_patch.shape
            h = self.num_heads
            assert self.attn_impl in ("pallas", "pallas_fused") and keep_mask is None
            from synchformer_tpu.ops.pallas.divided_attention_bwd import (
                divided_attention_proj_split,
                divided_attention_split,
            )

            qkv_kernel, qkv_bias = DenseParams(d, 3 * d, name="qkv")()
            if ln is not None:
                x_cls = layer_norm(x_cls, ln[0], ln[1], self.ln_eps, self.dtype)
                if patch_ln_stats is not None:
                    # row statistics emitted by the producing slab kernel
                    # (fused_rows stats variant): the LN apply fuses into
                    # the QKV projection without a full re-read for the
                    # reduce (0.37 ms/layer at the tower's shape)
                    from synchformer_tpu.ops.pallas.fused_rows import (
                        layer_norm_from_stats,
                    )

                    x_patch = layer_norm_from_stats(
                        x_patch, patch_ln_stats[..., 0:1],
                        patch_ln_stats[..., 1:2], ln[0], ln[1],
                        self.ln_eps, self.dtype)
                else:
                    x_patch = layer_norm(x_patch, ln[0], ln[1], self.ln_eps,
                                         self.dtype)
            qkv_c = dense(x_cls, qkv_kernel, qkv_bias, self.dtype)
            qkv_p = dense(x_patch, qkv_kernel, qkv_bias, self.dtype)
            if residual is not None:
                # the encoder only takes the split flow at 128-lane-aligned
                # head groupings (use_split's `groupable`), which is exactly
                # the fused kernel's own precondition
                assert deterministic or self.proj_dropout == 0.0
                proj_kernel, proj_bias = DenseParams(d, d, name="proj")()
                y_p, y_c = divided_attention_proj_split(
                    qkv_p, qkv_c, residual[1], residual[0],
                    proj_kernel, proj_bias, h, mode)
                return (y_c, y_p)
            out_p, out_c = divided_attention_split(qkv_p, qkv_c, h, mode)
            proj = nn.Dense(d, dtype=self.dtype, name="proj")
            drop = nn.Dropout(self.proj_dropout)
            return (drop(proj(out_c), deterministic=deterministic),
                    drop(proj(out_p), deterministic=deterministic))

        b, seq, d = x.shape
        h = self.num_heads
        dh = d // h
        f = num_frames
        n = (seq - 1) // f
        assert 1 + f * n == seq, (seq, f)
        qkv_kernel, qkv_bias = DenseParams(d, 3 * d, name="qkv")()

        if self.attn_impl in ("pallas", "pallas_fused") and keep_mask is not None:
            # the pallas kernels do not support keep-masks; warn once and fall
            # through to the XLA path (~2x slower) instead of silently
            # degrading with no trace
            global _WARNED_PALLAS_MASK_FALLBACK
            if not _WARNED_PALLAS_MASK_FALLBACK:
                import logging

                logging.warning(
                    "attn_impl='pallas' with a keep_mask: falling back to the "
                    "XLA divided-attention path (pallas kernels are "
                    "unmasked-only). This warning is shown once.")
                _WARNED_PALLAS_MASK_FALLBACK = True

        if self.attn_impl in ("pallas", "pallas_fused") and keep_mask is None:
            from synchformer_tpu.ops.pallas.divided_attention_bwd import (
                divided_attention,
            )

            if ln is not None and self.attn_impl == "pallas_fused":
                # LN + QKV matmul + attention in ONE kernel. Opt-in only:
                # measured SLOWER than the composition below on v5e (the
                # sequential head axis required by the qkv scratch breaks
                # Mosaic's cross-program pipelining: space 21.5 vs 17.7
                # ms/layer) — kept for future hardware/toolchain revisits.
                from synchformer_tpu.ops.pallas.fused_block import (
                    fused_divided_attention,
                )

                out = fused_divided_attention(
                    x, ln[0], ln[1],
                    qkv_kernel.astype(self.dtype), qkv_bias.astype(self.dtype),
                    h, f, mode, self.ln_eps)
            else:
                if ln is not None:
                    x = layer_norm(x, ln[0], ln[1], self.ln_eps, self.dtype)
                qkv_flat = dense(x, qkv_kernel, qkv_bias, self.dtype)
                # custom-vjp wrapper: fused pallas forward AND backward kernels
                out = divided_attention(qkv_flat, h, f, mode)
            out = out.reshape(b, seq, d)
            out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_dropout)(out, deterministic=deterministic)

        if ln is not None:
            x = layer_norm(x, ln[0], ln[1], self.ln_eps, self.dtype)
        qkv = dense(x, qkv_kernel, qkv_bias, self.dtype)
        qkv = qkv.reshape(b, seq, 3, h, dh)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (b, seq, h, dh)
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))  # (b, h, seq, dh)
        q = q * (dh ** -0.5)

        # --- CLS attends to everything -----------------------------------
        cls_q = q[:, :, :1]  # (b, h, 1, dh)
        cls_logits = jnp.einsum("bhqd,bhkd->bhqk", cls_q, k,
                                preferred_element_type=jnp.float32)
        cls_keep = keep_mask[:, None, None, :].astype(bool) if keep_mask is not None else None
        cls_probs = _masked_softmax(cls_logits, cls_keep, q.dtype)
        cls_out = jnp.einsum("bhqk,bhkd->bhqd", cls_probs, v)  # (b, h, 1, dh)

        # --- patch tokens attend within regrouped axis --------------------
        def regroup(t):  # (b, h, f*n, dh) -> (b, h, G, L, dh)
            t = t.reshape(b, h, f, n, dh)
            if mode == "time":
                t = jnp.swapaxes(t, 2, 3)  # groups=n, length=f
            return t

        q_ = regroup(q[:, :, 1:])
        k_ = regroup(k[:, :, 1:])
        v_ = regroup(v[:, :, 1:])
        g, l = q_.shape[2], q_.shape[3]
        # prepend CLS key/value to every group
        cls_k = jnp.broadcast_to(k[:, :, :1][:, :, None], (b, h, g, 1, dh))
        cls_v = jnp.broadcast_to(v[:, :, :1][:, :, None], (b, h, g, 1, dh))
        k_ = jnp.concatenate([cls_k, k_], axis=3)  # (b, h, g, 1+l, dh)
        v_ = jnp.concatenate([cls_v, v_], axis=3)

        group_keep = None
        if keep_mask is not None:
            m = keep_mask[:, 1:].astype(bool).reshape(b, f, n)
            if mode == "time":
                m = jnp.swapaxes(m, 1, 2)
            cls_m = jnp.broadcast_to(keep_mask[:, :1].astype(bool)[:, None], (b, g, 1))
            m = jnp.concatenate([cls_m, m], axis=2)  # (b, g, 1+l)
            group_keep = m[:, None, :, None, :]  # (b, 1, g, 1, 1+l)

        logits = jnp.einsum("bhgqd,bhgkd->bhgqk", q_, k_,
                            preferred_element_type=jnp.float32)
        probs = _masked_softmax(logits, group_keep, q.dtype)
        out = jnp.einsum("bhgqk,bhgkd->bhgqd", probs, v_)  # (b, h, g, l, dh)

        if mode == "time":
            out = jnp.swapaxes(out, 2, 3)  # back to (b, h, f, n, dh)
        out = out.reshape(b, h, f * n, dh)
        out = jnp.concatenate([cls_out, out], axis=2)  # (b, h, seq, dh)
        out = jnp.swapaxes(out, 1, 2).reshape(b, seq, d)

        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_dropout)(out, deterministic=deterministic)
        return out


class DividedSpaceTimeBlock(nn.Module):
    """Time-attn (no drop-path on residual) -> space-attn -> MLP
    (ref: vit_helper.py:332-376)."""

    num_heads: int
    num_frames: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path: float = 0.0
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    def _drop_path_pair(self, pair, deterministic):
        """DropPath with ONE per-sample draw shared by both halves of the
        (cls, patches) split (the reference drops the whole residual branch
        per sample)."""
        if self.drop_path == 0.0 or deterministic:
            return pair
        rng = self.make_rng("droppath")
        keep = jax.random.bernoulli(rng, 1.0 - self.drop_path,
                                    (pair[0].shape[0],))
        scale = (keep / (1.0 - self.drop_path)).astype(pair[0].dtype)
        return (pair[0] * scale[:, None, None],
                pair[1] * scale[:, None, None, None])

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True,
                 patch_ln_stats=None, emit_patch_stats: bool = False):
        """``patch_ln_stats``: (B, f, n, 8) stats of x's patch half from the
        previous block's slab kernel (lanes [mean, meansq, ...]) — consumed
        by this block's pre-time-attention LN. ``emit_patch_stats``: return
        ((cls, patch), stats-of-output) for the next block. Both are
        deterministic-split-pallas-path options; other paths ignore them."""
        split = isinstance(x, tuple)
        d = (x[1] if split else x).shape[-1]
        # fused proj+residual epilogue on the deterministic inference /
        # frozen-tower path only: the attention output projection and
        # residual add run inside the attention kernel. Training keeps the
        # unfused path even when the stochastic rates are 0 — its dedicated
        # pallas backward avoids the fused VJP's extra attention-forward
        # recompute under remat.
        fuse_proj = (split and self.attn_impl == "pallas"
                     and keep_mask is None and deterministic)
        # LN params are declared here (same tree as nn.LayerNorm) and handed
        # to the attention, which fuses the normalization into its kernel on
        # the pallas path
        ln3 = LNParams(d, name="norm3")()
        t_out = DividedAttention(
            num_heads=self.num_heads, proj_dropout=self.dropout, dtype=self.dtype,
            attn_impl=self.attn_impl, ln_eps=self.ln_eps, name="timeattn",
        )(x, num_frames=self.num_frames, mode="time", keep_mask=keep_mask,
          deterministic=deterministic, ln=ln3,
          residual=(x if fuse_proj else None),
          patch_ln_stats=(patch_ln_stats if fuse_proj else None))
        # reference adds the time output without drop-path
        if fuse_proj:
            x = t_out  # residual already added in the kernel epilogue
        else:
            x = ((x[0] + t_out[0], x[1] + t_out[1]) if split else x + t_out)

        ln1 = LNParams(d, name="norm1")()
        s_out = DividedAttention(
            num_heads=self.num_heads, proj_dropout=self.dropout, dtype=self.dtype,
            attn_impl=self.attn_impl, ln_eps=self.ln_eps, name="attn",
        )(x, num_frames=self.num_frames, mode="space", keep_mask=keep_mask,
          deterministic=deterministic, ln=ln1,
          residual=(x if fuse_proj else None))
        if fuse_proj:
            x = s_out  # drop-path inactive on this path by construction
        elif split:
            s_out = self._drop_path_pair(s_out, deterministic)
            x = (x[0] + s_out[0], x[1] + s_out[1])
        else:
            x = x + DropPath(self.drop_path, name="drop_path_s")(s_out, deterministic)

        # MLP: LN -> fc1 -> exact GELU -> fc2 (-> dropout/drop-path) with the
        # residual. One pallas kernel when the stochastic pieces are inactive.
        ln2_scale, ln2_bias = LNParams(d, name="norm2")()
        k1, b1, k2, b2 = MlpParams(d, int(d * self.mlp_ratio), name="mlp")()
        stochastic = not deterministic and (self.dropout > 0.0 or self.drop_path > 0.0)
        if split:
            cls, patch = x
            if not stochastic:
                from synchformer_tpu.ops.pallas.fused_rows import (
                    _ln_mlp_ref,
                    fused_ln_mlp_residual,
                    fused_ln_mlp_residual_stats,
                )

                out_stats = None
                if emit_patch_stats and deterministic:
                    patch, out_stats = fused_ln_mlp_residual_stats(
                        patch, ln2_scale, ln2_bias,
                        k1.astype(self.dtype), b1.astype(self.dtype),
                        k2.astype(self.dtype), b2.astype(self.dtype),
                        self.ln_eps)
                else:
                    patch = fused_ln_mlp_residual(
                        patch, ln2_scale, ln2_bias,
                        k1.astype(self.dtype), b1.astype(self.dtype),
                        k2.astype(self.dtype), b2.astype(self.dtype),
                        self.ln_eps)
                # the CLS row is (B, 1, D) — the XLA composition is cheaper
                # than spinning up a kernel for it
                cls = _ln_mlp_ref(cls, ln2_scale, ln2_bias,
                                  k1.astype(self.dtype), b1.astype(self.dtype),
                                  k2.astype(self.dtype), b2.astype(self.dtype),
                                  self.ln_eps)
                if emit_patch_stats:
                    return (cls, patch), out_stats
                return (cls, patch)

            def mlp_part(t):
                hh = dense(layer_norm(t, ln2_scale, ln2_bias, self.ln_eps,
                                      self.dtype), k1, b1, self.dtype)
                hh = nn.Dropout(self.dropout)(exact_gelu(hh),
                                              deterministic=deterministic)
                return nn.Dropout(self.dropout)(dense(hh, k2, b2, self.dtype),
                                                deterministic=deterministic)

            m = self._drop_path_pair((mlp_part(cls), mlp_part(patch)),
                                     deterministic)
            return (cls + m[0], patch + m[1])
        if self.attn_impl == "pallas" and not stochastic:
            # row-chunked LN+fc1+GELU+fc2+residual: the (B*N, 4D) fc1
            # intermediate (1.08 GB/layer at B*S=112 bf16) never reaches HBM,
            # and the row-chunk grid keeps the GELU VPU work pipelined
            # against the next chunk's matmul (the monolithic per-segment
            # fused_block variant serialized them and measured slower)
            from synchformer_tpu.ops.pallas.fused_rows import fused_ln_mlp_residual

            x = fused_ln_mlp_residual(x, ln2_scale, ln2_bias,
                                      k1.astype(self.dtype), b1.astype(self.dtype),
                                      k2.astype(self.dtype), b2.astype(self.dtype),
                                      self.ln_eps)
        elif self.attn_impl == "pallas_fused" and not stochastic:
            # opt-in only: measured ~7% slower than the XLA composition on
            # v5e (XLA pipelines the GELU VPU work against the matmuls of
            # adjacent tiles; the monolithic kernel serializes them)
            from synchformer_tpu.ops.pallas.fused_block import fused_mlp_residual

            x = fused_mlp_residual(x, ln2_scale, ln2_bias,
                                   k1.astype(self.dtype), b1.astype(self.dtype),
                                   k2.astype(self.dtype), b2.astype(self.dtype),
                                   self.ln_eps)
        else:
            h = dense(layer_norm(x, ln2_scale, ln2_bias, self.ln_eps, self.dtype),
                      k1, b1, self.dtype)
            h = nn.Dropout(self.dropout)(exact_gelu(h), deterministic=deterministic)
            m_out = nn.Dropout(self.dropout)(dense(h, k2, b2, self.dtype),
                                             deterministic=deterministic)
            x = x + DropPath(self.drop_path, name="drop_path_m")(m_out, deterministic)
        return x


class _PatchEmbedDense(nn.Module):
    """patch_embed_3d applied to pre-patchified (patch-major) tokens.

    Declares the SAME variables as the 3D-conv patch embed — kernel
    (z, p, p, c, D) and bias (D,) — and applies them as one (z*p*p*c, D)
    matmul; the flatten order (z, ph, pw, c) matches
    ops/video.py::patchify_frames' patch-vector order, so the two input
    ranks are numerically the same patch embedding (tested in
    tests/test_models.py). Zero-init kernel per ref: video_model_builder.py:61.
    """

    features: int
    kernel_shape: tuple  # (z, p, p, c)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.zeros,
                            (*self.kernel_shape, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.dot(x.astype(self.dtype),
                    kernel.reshape(-1, self.features).astype(self.dtype))
        return y + bias.astype(self.dtype)


@register("synchformer_tpu.models.motionformer.MotionFormerEncoder",
          "model.modules.feat_extractors.visual.motionformer.MotionFormer")
class MotionFormerEncoder(nn.Module):
    """Divided space-time ViT-B video tower + factorized space-time aggregation.

    Input:  (B, S, T, H, W, C) channels-last uint8-normalized frames
            (T=16, H=W=224, C=3); the segment axis S folds into batch.
    Output: (features, global_features)
            features: (B, S, t, D) with t=8 if agg_time_module='Identity'
                      (sync config), else (B, S, D)
            global_features: (B, D) if add_global_repr else None

    Config parity: divided_224_16x4.yaml (depth 12, heads 12, D 768, mlp 4,
    qkv_bias, patch 16, z_block 2, temporal_resolution 8, drop_path 0.2,
    pos 'separate') as patched by ref: visual/motionformer.py:85-104.
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    attn_layer: str = "divided"  # 'divided' (default cfg) | 'joint' (joint_224_16x4)
    patch_size: int = 16
    z_block_size: int = 2
    temporal_resolution: int = 8  # frames after 3D patching (16 / z_block)
    img_size: int = 224
    drop_rate: float = 0.0
    pos_dropout: float = 0.0
    drop_path_rate: float = 0.2
    ln_eps: float = 1e-6
    factorize_space_time: bool = True
    agg_space_module: str = "TransformerEncoderLayer"
    agg_time_module: str = "Identity"
    add_global_repr: bool = False
    max_segments: Optional[int] = None
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"  # 'pallas' fuses divided attention in VMEM (fwd path)
    # reference-config compatibility: checkpoint loading/conversion is handled
    # by synchformer_tpu.utils.checkpoint, not the module (ref: motionformer.py:52-114)
    ckpt_path: Optional[str] = None
    extract_features: bool = True
    agg_segments_module: Optional[str] = None

    @property
    def grid_hw(self) -> int:
        return self.img_size // self.patch_size

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True):
        f = self.temporal_resolution
        gh = gw = self.grid_hw
        n_spatial = gh * gw
        d = self.embed_dim

        if x.ndim == 5:
            # Pre-patchified input (B, S, f, n_spatial, z*p*p*c), patch-major
            # (ops/video.py::patchify_frames) — the strided 3D patch conv
            # becomes one dense MXU matmul. On TPU the conv lowering forces a
            # batch-in-sublanes input relayout (1.75 ms/iter at B=8,S=14) and
            # runs the strided-window fusion at ~2.2x its matmul floor
            # (4.72 ms vs ~2.1); patchifying on the host (pure byte shuffle,
            # rides the loader) removes both. Same param tree as the conv
            # path (patch_embed_3d/{kernel,bias}), so checkpoints and
            # fold_video_normalize work unchanged on either input rank.
            b, s, f_in, n_in, pk = x.shape
            assert f_in == f and n_in == n_spatial, (x.shape, f, n_spatial)
            assert keep_mask is None, "keep_mask requires 6D frame input"
            tokens = _PatchEmbedDense(
                features=d,
                kernel_shape=(self.z_block_size, self.patch_size,
                              self.patch_size, pk // (self.z_block_size
                                                      * self.patch_size ** 2)),
                dtype=self.dtype, name="patch_embed_3d",
            )(x.reshape(b * s, f, n_spatial, pk))
            tokens = tokens.reshape(b * s, f * n_spatial, d)
            t_in, c = f * self.z_block_size, pk // (self.z_block_size
                                                    * self.patch_size ** 2)
        else:
            b, s, t_in, hh, ww, c = x.shape
            flat = x.reshape(b * s, t_in, hh, ww, c).astype(self.dtype)

            # 3D patch embed; reference zero-inits the conv kernel
            # (ref: video_model_builder.py:61)
            tokens = nn.Conv(
                features=d,
                kernel_size=(self.z_block_size, self.patch_size, self.patch_size),
                strides=(self.z_block_size, self.patch_size, self.patch_size),
                padding="VALID", dtype=self.dtype, kernel_init=nn.initializers.zeros,
                name="patch_embed_3d",
            )(flat)  # (BS, f, gh, gw, D)
            tokens = tokens.reshape(b * s, f * n_spatial, d)  # frame-major ordering

        tok_keep = None
        if keep_mask is not None:
            # token keep = min-pool of content keep over each patch window: a
            # token is masked iff its receptive field overlaps masked content
            # (XLA-native equivalent of the reference's inf-indicator trick,
            # ref: video_model_builder.py:182-203)
            km = keep_mask.reshape(b * s, t_in, hh, ww, c).astype(jnp.float32)
            pooled = jax.lax.reduce_window(
                km, 1.0, jax.lax.min,
                (1, self.z_block_size, self.patch_size, self.patch_size, c),
                (1, self.z_block_size, self.patch_size, self.patch_size, c),
                "VALID")
            tok_keep = pooled.reshape(b * s, f * n_spatial) > 0.5
            tok_keep = jnp.concatenate(
                [jnp.ones((b * s, 1), bool), tok_keep], axis=1)

        cls = self.param("cls_token", trunc02, (1, 1, d))
        # split (cls, patches) flow: the pallas kernels take patches as
        # (BS, f, n, 3D) 4D blocks — the DMA pads the n=196 slabs to sublane
        # boundaries, removing the misaligned in-kernel reshape relayouts
        # (space 12.1 -> 8.4 ms/layer measured). The tower drops CLS at the
        # end, so the two parts never need concatenating.
        dh = d // self.num_heads
        hpg = max(1, 128 // dh)
        groupable = self.num_heads % hpg == 0 and (dh * hpg) % 128 == 0
        use_split = (self.attn_layer != "joint"
                     and self.attn_impl in ("pallas", "pallas_fused")
                     and tok_keep is None and groupable)
        if use_split:
            pos_spatial = self.param("pos_embed", trunc02, (1, n_spatial + 1, d))
            pos_temporal = self.param("temp_embed", nn.initializers.zeros,
                                      (1, self.temporal_resolution, d))
            patch_pos = (pos_spatial[:, None, 1:]
                         + pos_temporal[:, :, None]).astype(tokens.dtype)
            patches = tokens.reshape(b * s, f, n_spatial, d) + patch_pos
            cls_tok = (jnp.broadcast_to(cls.astype(tokens.dtype), (b * s, 1, d))
                       + pos_spatial[:, :1].astype(tokens.dtype))
            drop = nn.Dropout(self.pos_dropout)
            xsplit = (drop(cls_tok, deterministic=deterministic),
                      drop(patches, deterministic=deterministic))

            dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
            block_cls = DividedSpaceTimeBlock
            if self.remat:
                block_cls = nn.remat(DividedSpaceTimeBlock, static_argnums=(3,))
            # deterministic pallas path: each block's slab kernel emits the
            # LN stats of its patch output; the next block's norm3 (and the
            # final tower norm) apply them without re-reading the tensor
            # for the reduce (12 x 0.37 ms/iter at B=8,S=14)
            chain_stats = (self.attn_impl == "pallas" and deterministic
                           and not self.remat)
            stats = None
            for i in range(self.depth):
                blk = block_cls(
                    num_heads=self.num_heads, num_frames=f, mlp_ratio=self.mlp_ratio,
                    dropout=self.drop_rate, drop_path=float(dpr[i]), ln_eps=self.ln_eps,
                    dtype=self.dtype, attn_impl=self.attn_impl, name=f"blocks_{i}",
                )
                if chain_stats:
                    xsplit, stats = blk(xsplit, None, deterministic,
                                        patch_ln_stats=stats,
                                        emit_patch_stats=True)
                else:
                    xsplit = blk(xsplit, None, deterministic)

            if chain_stats:
                from synchformer_tpu.ops.pallas.fused_rows import (
                    layer_norm_from_stats,
                )

                n_scale, n_bias = LNParams(d, name="norm")()
                feats = layer_norm_from_stats(
                    xsplit[1], stats[..., 0:1], stats[..., 1:2],
                    n_scale, n_bias, self.ln_eps, self.dtype)
            else:
                feats = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                                     name="norm")(xsplit[1])
            feats = feats.reshape(b * s, f, gh, gw, d)
            return self._aggregate(feats, None, b, s, deterministic)

        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(tokens.dtype), (b * s, 1, d)), tokens], axis=1)

        if self.attn_layer == "joint":
            # joint positional embedding (ref: video_model_builder.py:79-81,255-256)
            st = self.param("st_embed", trunc02, (1, f * n_spatial + 1, d))
            tokens = tokens + st.astype(tokens.dtype)
        else:
            # 'separate' positional embedding (ref: video_model_builder.py:246-254)
            pos_spatial = self.param("pos_embed", trunc02, (1, n_spatial + 1, d))
            pos_temporal = self.param("temp_embed", nn.initializers.zeros,
                                      (1, self.temporal_resolution, d))
            tile_pos = jnp.tile(pos_spatial[:, 1:], (1, f, 1))
            tile_temp = jnp.repeat(pos_temporal, n_spatial, axis=1)
            full_pos = jnp.concatenate([pos_spatial[:, :1], tile_pos + tile_temp],
                                       axis=1)
            tokens = tokens + full_pos.astype(tokens.dtype)
        tokens = nn.Dropout(self.pos_dropout)(tokens, deterministic=deterministic)

        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        if self.attn_layer == "joint":
            # joint space-time attention: plain pre-LN ViT blocks over all
            # 1+f*n tokens (ref: vit_helper.py:45-77,297-329)
            from synchformer_tpu.models.layers import PreLNBlock

            block_cls = PreLNBlock
            if self.remat:
                block_cls = nn.remat(PreLNBlock, static_argnums=(3,))
            for i in range(self.depth):
                tokens = block_cls(
                    num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                    qkv_bias=True, ln_eps=self.ln_eps, attn_dropout=0.0,
                    resid_dropout=self.drop_rate, drop_path=float(dpr[i]),
                    dtype=self.dtype, name=f"blocks_{i}",
                )(tokens, tok_keep, deterministic)
        else:
            block_cls = DividedSpaceTimeBlock
            if self.remat:
                block_cls = nn.remat(DividedSpaceTimeBlock, static_argnums=(3,))
            for i in range(self.depth):
                tokens = block_cls(
                    num_heads=self.num_heads, num_frames=f, mlp_ratio=self.mlp_ratio,
                    dropout=self.drop_rate, drop_path=float(dpr[i]), ln_eps=self.ln_eps,
                    dtype=self.dtype, attn_impl=self.attn_impl, name=f"blocks_{i}",
                )(tokens, tok_keep, deterministic)

        # feature extraction: drop CLS, LayerNorm, restore (t, h, w)
        # (ref: visual/motionformer.py:229-246)
        feats = tokens[:, 1:, :]
        feats = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(feats)
        feats = feats.reshape(b * s, f, gh, gw, d)

        feat_keep = None
        if tok_keep is not None:
            feat_keep = tok_keep[:, 1:].reshape(b * s, f, gh, gw)
        return self._aggregate(feats, feat_keep, b, s, deterministic)

    def _aggregate(self, feats, feat_keep, b, s, deterministic):
        """Factorized space/time aggregation tail (shared by the packed and
        split token flows). Submodules created here live inside the compact
        __call__ context."""
        agg_impl = ("pallas" if self.attn_impl in ("pallas", "pallas_fused")
                    else "xla")
        if self.factorize_space_time:
            if self.agg_space_module == "TransformerEncoderLayer":
                feats = SpatialAggregator(
                    num_heads=self.num_heads, dropout=self.drop_rate,
                    dtype=self.dtype, impl=agg_impl, name="spatial_attn_agg",
                )(feats, keep_mask=feat_keep, deterministic=deterministic)
            elif self.agg_space_module == "AveragePooling":
                feats = AveragePooling(avg_pattern="bs t h w d -> bs t d",
                                       name="spatial_attn_agg")(feats)
            if self.agg_time_module == "TransformerEncoderLayer":
                feats = TemporalAggregator(
                    num_heads=self.num_heads, dropout=self.drop_rate,
                    dtype=self.dtype, impl=agg_impl, name="temp_attn_agg",
                )(feats, deterministic=deterministic)
            elif self.agg_time_module == "AveragePooling":
                feats = AveragePooling(avg_pattern="bs t d -> bs d",
                                       name="temp_attn_agg")(feats)
            # 'Identity': keep (BS, t, D)

        feats = feats.reshape(b, s, *feats.shape[1:])

        global_feats = None
        if self.add_global_repr:
            assert feats.ndim == 3, "global repr expects (B, S, D) features"
            pos_max_len = self.max_segments if self.max_segments is not None else 16
            global_feats = TemporalAggregator(
                num_heads=self.num_heads, dropout=self.drop_rate,
                add_pos_emb=True, pos_max_len=pos_max_len,
                pos_emb_drop=self.pos_dropout, dtype=self.dtype,
                impl=agg_impl, name="global_attn_agg",
            )(feats, deterministic=deterministic)

        return feats, global_feats
