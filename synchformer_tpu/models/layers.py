"""Transformer building blocks, TPU-first.

Design notes (vs the reference's torch modules):

- QKV is computed as ONE fused matmul per attention (the reference uses three
  separate Linears in its minGPT attention, ref: model/modules/transformer.py:42-44;
  one packed Linear in Motionformer's DividedAttention, ref:
  motionformer_src/vit_helper.py:88). One (N, D) @ (D, 3D) matmul keeps the MXU
  busy and lets XLA fuse the bias/reshape epilogue.
- softmax runs in fp32 regardless of compute dtype (bf16-safe attention).
- GELU is the exact (erf) variant everywhere — torch's nn.GELU default — NOT
  jax.nn.gelu's tanh approximation; this matters for checkpoint parity.
- masks are additive  (0 / -inf) biases computed from boolean keep-masks.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def exact_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


class LNParams(nn.Module):
    """LayerNorm parameters WITHOUT the computation — produces the exact
    param tree of nn.LayerNorm ({scale, bias}) so the converter/checkpoints
    are unaffected, while letting the caller feed the raw values into a fused
    pallas kernel (or apply the normalization manually)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class DenseParams(nn.Module):
    """Dense parameters without the matmul (same tree/init as nn.Dense:
    lecun_normal kernel, zeros bias) — for fused-kernel callers."""

    features_in: int
    features_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.features_in, self.features_out))
        bias = (self.param("bias", nn.initializers.zeros, (self.features_out,))
                if self.use_bias else None)
        return kernel, bias


class MlpParams(nn.Module):
    """fc1/fc2 parameters with the exact tree of the Mlp module (for feeding
    the fused LN+MLP pallas kernel or the manual fallback)."""

    features: int
    hidden: int

    @nn.compact
    def __call__(self):
        k1, b1 = DenseParams(self.features, self.hidden, name="fc1")()
        k2, b2 = DenseParams(self.hidden, self.features, name="fc2")()
        return k1, b1, k2, b2


def attention_bias_from_keep_mask(keep: Optional[jnp.ndarray], dtype) -> Optional[jnp.ndarray]:
    """keep: (..., N) bool/int, 1 = attend-to. Returns (..., 1, 1, N) additive bias."""
    if keep is None:
        return None
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=jnp.float32)
    bias = jnp.where(keep.astype(bool), 0.0, neg)
    return bias[..., None, None, :]  # broadcast over heads and query positions


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
) -> jnp.ndarray:
    """q,k,v: (..., H, N, Dh). bias broadcastable to (..., H, Nq, Nk). fp32 softmax."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...hqd,...hkd->...hqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = probs.astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    return jnp.einsum("...hqk,...hkd->...hqd", probs, v)


class MultiHeadSelfAttention(nn.Module):
    """Fused-QKV multi-head self-attention with output projection.

    Parameter layout: qkv kernel (D, 3D) ordered [q | k | v] so that torch
    checkpoints with packed in_proj (nn.MultiheadAttention, DividedAttention)
    convert by transpose, and separate-q/k/v checkpoints convert by concat.
    """

    num_heads: int
    qkv_bias: bool = True
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    dtype: Dtype = jnp.float32
    impl: str = "xla"  # 'pallas' fuses the softmax in VMEM (unmasked only)

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True,
                 query_rows: Optional[int] = None):
        d = x.shape[-1]
        head_dim = d // self.num_heads
        if query_rows is not None:
            # CLS-pooling specialization: only the first `query_rows` query
            # rows are consumed downstream, so Q is projected for those rows
            # alone and K/V for all tokens — 2/3 of the QKV matmul, a
            # (query_rows, N) attention instead of (N, N). Identical math
            # and param tree ({qkv,proj} Dense) to the full path; the packed
            # (D, 3D) kernel is applied in two column slices.
            kernel, bias = DenseParams(d, 3 * d, use_bias=self.qkv_bias,
                                       name="qkv")()
            kernel = kernel.astype(self.dtype)
            xc = x.astype(self.dtype)
            q = xc[..., :query_rows, :] @ kernel[:, :d]
            kv = xc @ kernel[:, d:]
            if bias is not None:
                q = q + bias[:d].astype(self.dtype)
                kv = kv + bias[d:].astype(self.dtype)
            lead = x.shape[:-2]
            q = q.reshape(*lead, query_rows, self.num_heads, head_dim)
            kv = kv.reshape(*lead, x.shape[-2], 2, self.num_heads, head_dim)
            k, v = jnp.moveaxis(kv, -3, 0)
            q, k, v = (jnp.swapaxes(t, -3, -2) for t in (q, k, v))
            bias_att = attention_bias_from_keep_mask(keep_mask, self.dtype)
            rng = (self.make_rng("dropout")
                   if (self.attn_dropout > 0 and not deterministic) else None)
            out = scaled_dot_attention(
                q, k, v, bias=bias_att, dropout_rate=self.attn_dropout,
                deterministic=deterministic, dropout_rng=rng)
            out = jnp.swapaxes(out, -3, -2).reshape(*lead, query_rows, d)
            out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_dropout)(out, deterministic=deterministic)
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        attn_stochastic = self.attn_dropout > 0.0 and not deterministic
        if self.impl == "pallas" and keep_mask is None and not attn_stochastic:
            from synchformer_tpu.ops.pallas.standard_attention import (
                groupable,
                standard_attention,
            )

            if groupable(self.num_heads, head_dim):
                lead = x.shape[:-1]
                out = standard_attention(qkv.reshape(-1, lead[-1], 3 * d),
                                         self.num_heads)
                out = out.reshape(*lead, d)
                out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
                return nn.Dropout(self.proj_dropout)(
                    out, deterministic=deterministic)
        qkv = qkv.reshape(*x.shape[:-1], 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, -3, 0)
        q = jnp.swapaxes(q, -3, -2)  # (..., H, N, Dh)
        k = jnp.swapaxes(k, -3, -2)
        v = jnp.swapaxes(v, -3, -2)
        bias = attention_bias_from_keep_mask(keep_mask, self.dtype)
        rng = self.make_rng("dropout") if (self.attn_dropout > 0 and not deterministic) else None
        out = scaled_dot_attention(
            q, k, v, bias=bias,
            dropout_rate=self.attn_dropout, deterministic=deterministic, dropout_rng=rng,
        )
        out = jnp.swapaxes(out, -3, -2).reshape(x.shape)
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_dropout)(out, deterministic=deterministic)
        return out


class Mlp(nn.Module):
    """fc1 -> exact GELU -> dropout -> fc2 -> dropout (timm/minGPT MLP shape)."""

    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    act: Callable = staticmethod(exact_gelu)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        h = self.act(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath; ref: vit_helper.py:312)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, shape)
        return x * keep / (1.0 - self.rate)


class _MHSAParams(nn.Module):
    """MultiHeadSelfAttention's parameters without the computation — the
    exact tree ({qkv, proj} Dense) under the same scope, for feeding the
    fused CLS-pool kernel."""

    features: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        qkv = DenseParams(self.features, 3 * self.features,
                          use_bias=self.qkv_bias, name="qkv")()
        proj = DenseParams(self.features, self.features, name="proj")()
        return qkv, proj


class PreLNBlock(nn.Module):
    """Pre-LayerNorm transformer block: x + attn(ln1(x)); x + mlp(ln2(x)).

    Covers both the minGPT block of the sync transformer
    (ref: model/modules/transformer.py:79-97; ln eps 1e-5, heads 8) and the
    HF-AST encoder layer (ref: hf_src/modeling_ast.py:281-323; eps 1e-12).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-5
    attn_dropout: float = 0.0
    resid_dropout: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32
    impl: str = "xla"  # 'pallas' fuses the LN+MLP half in VMEM (fwd path)

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True,
                 query_rows: Optional[int] = None, cls_row=None):
        """With ``query_rows=r`` only the first r rows of the output are
        computed and returned, (..., r, D) — exact for CLS-pooling consumers
        (attention still keys/values over ALL tokens; LN/MLP/residual are
        row-wise, so dropping the dead rows changes nothing). At the spatial
        aggregator's (896, 197, 768) this removes ~99% of the block's MLP
        and 1/3 of its QKV matmul (~13 ms/iter e2e, measured round 4).

        ``cls_row``: optional (1, 1, D)/(1, D) row to treat as a shared
        token 0 WITHOUT the caller materializing the (B, 1+N, D) concat
        (0.84 ms of HBM write at the spatial aggregator): the fused kernel
        prepends its K/V in VMEM; non-fused branches concat here instead —
        identical math either way."""
        d = x.shape[-1]
        stochastic_any = not deterministic and (
            self.attn_dropout > 0.0 or self.resid_dropout > 0.0
            or self.drop_path > 0.0)
        if (query_rows == 1 and self.impl == "pallas" and keep_mask is None
                and x.ndim == 3 and self.qkv_bias and not stochastic_any):
            # whole CLS-pool layer in one pallas program per segment chunk:
            # LN1 -> QKV -> 1-row attention -> proj -> residual -> LN2 ->
            # MLP -> residual, K/V never leave VMEM (kills the 1.62 ms KV
            # relayout + the separate logits/PV/LN fusions at the spatial
            # aggregator's shape — see ops/pallas/cls_pool.py). Identical
            # param tree to the module branches below.
            from synchformer_tpu.ops.pallas.cls_pool import (
                fused_cls_pool,
                fused_cls_pool_tokens,
            )

            ln1_scale, ln1_bias = LNParams(d, name="ln1")()
            (qkv_k, qkv_b), (proj_k, proj_b) = _MHSAParams(
                d, self.qkv_bias, name="attn")()
            ln2_scale, ln2_bias = LNParams(d, name="ln2")()
            k1, b1, k2, b2 = MlpParams(d, int(d * self.mlp_ratio),
                                       name="mlp")()
            if cls_row is not None:
                out = fused_cls_pool_tokens(
                    x.astype(self.dtype), cls_row.astype(self.dtype),
                    ln1_scale, ln1_bias, qkv_k, qkv_b, proj_k, proj_b,
                    ln2_scale, ln2_bias, k1, b1, k2, b2,
                    num_heads=self.num_heads, eps=self.ln_eps)
            else:
                out = fused_cls_pool(
                    x.astype(self.dtype), ln1_scale, ln1_bias, qkv_k, qkv_b,
                    proj_k, proj_b, ln2_scale, ln2_bias, k1, b1, k2, b2,
                    num_heads=self.num_heads, eps=self.ln_eps)
            return out[:, None, :]
        if cls_row is not None:
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_row.reshape(1, 1, d).astype(x.dtype),
                                  (x.shape[0], 1, d)), x], axis=1)
        attn_out = MultiHeadSelfAttention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_dropout=self.attn_dropout, proj_dropout=self.resid_dropout,
            dtype=self.dtype, impl=self.impl, name="attn",
        )(nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln1")(x),
          keep_mask=keep_mask, deterministic=deterministic,
          query_rows=query_rows)
        if query_rows is not None:
            x = x[..., :query_rows, :]
        x = x + DropPath(self.drop_path, name="drop_path1")(attn_out, deterministic)
        stochastic = not deterministic and (self.resid_dropout > 0.0
                                            or self.drop_path > 0.0)
        if self.impl == "pallas" and not stochastic and query_rows is None:
            # LN2+fc1+GELU+fc2+residual in one row-chunked kernel: the
            # (rows, 4D) fc1 intermediate never reaches HBM (see
            # ops/pallas/fused_rows.py). Identical param tree to the
            # nn.LayerNorm + Mlp branch below.
            from synchformer_tpu.ops.pallas.fused_rows import fused_ln_mlp_residual

            ln2_scale, ln2_bias = LNParams(d, name="ln2")()
            k1, b1, k2, b2 = MlpParams(d, int(d * self.mlp_ratio), name="mlp")()
            x = fused_ln_mlp_residual(
                x, ln2_scale, ln2_bias, k1.astype(self.dtype),
                b1.astype(self.dtype), k2.astype(self.dtype),
                b2.astype(self.dtype), self.ln_eps)
        else:
            mlp_out = Mlp(
                hidden_dim=int(d * self.mlp_ratio), dropout=self.resid_dropout,
                dtype=self.dtype, name="mlp",
            )(nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln2")(x),
              deterministic=deterministic)
            x = x + DropPath(self.drop_path, name="drop_path2")(mlp_out, deterministic)
        return x
