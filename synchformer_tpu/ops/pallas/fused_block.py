"""Megakernels for the divided space-time block: LN+QKV+attention and
LN+MLP+residual fused in VMEM.

Why: after the round-1 attention kernels, the remaining tower time was
dominated by HBM round-trips that XLA cannot fuse across the pallas_call
boundary (profiled on v5e, B=8: LayerNorms 84 ms, qkv matmuls 81 ms of a
639 ms tower — CLAUDE.md perf notes). Each attention previously cost five
HBM round-trips of ~(112, 1569, 768..2304) tensors:

    read x -> write ln -> read ln -> write qkv -> read qkv -> write out

The fused kernel does read x -> write out: LayerNorm statistics, the QKV
projection (MXU, fp32 accumulation) and the whole divided attention all stay
in VMEM. The MLP kernel likewise fuses LN -> fc1 -> exact GELU -> fc2 ->
residual-add into one read/write of x.

Gradients: both ops carry a jax.custom_vjp whose backward re-derives the
primal from an XLA-composed reference (manual LN + matmul + the round-1
``divided_attention`` custom-VJP whose *backward* is itself a pallas
kernel). Forward is one megakernel; backward reuses the already-verified
gradient paths — no new backward kernels to get wrong.

Semantics identical to the unfused module path (same LN formula as flax:
f32 fast-variance stats, affine in f32, cast to compute dtype); equality is
pinned by tests/test_fused_block.py in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synchformer_tpu.ops.pallas.divided_attention import (
    _space_segment,
    _time_block,
)
from synchformer_tpu.ops.pallas.divided_attention_bwd import divided_attention


# ---------------------------------------------------------------------------
# shared numerics (the XLA fallback path uses these exact functions too)
# ---------------------------------------------------------------------------

def layer_norm(x, scale, bias, eps: float, dtype):
    """flax.linen.LayerNorm numerics: f32 fast-variance stats, f32 affine,
    cast to the compute dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def dense(x, kernel, bias, dtype):
    """flax.linen.Dense numerics: promote everything to the compute dtype."""
    y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def exact_gelu_f32(x32):
    """Exact (erf) GELU on an f32 array."""
    return x32 * 0.5 * (1.0 + jax.lax.erf(x32 * (2.0 ** -0.5)))


# erf(z) ~= z * P9(z^2) on |z| <= 3 (clamped; erf(3) = 1 - 2.2e-5), degree-9
# Chebyshev least-squares fit converted to the power basis (coefficients
# decay monotonically, so f32 Horner stays well-conditioned: |err| <= 3e-5
# on the range incl. f32 evaluation). Replaces the A&S 7.1.26 rational form:
# pure FMAs, no exp/reciprocal/sign — the exp-based form cost 14.02 ms vs
# 12.84 ms for this one on the (896,196,768)x3072 slab LN+MLP chip bench
# (the GELU is the dominant non-MXU op in those program bodies).
_ERF_POLY = (1.1283768672322625, -0.37607043470191825, 0.11261191593609451,
             -0.026508097122118452, 0.004930427932570047,
             -0.0007122925277970079, 7.619287512854014e-05,
             -5.581884377842221e-06, 2.462992635407088e-07,
             -4.884558793996662e-09)


def _erf_poly(z):
    """erf on the VPU from FMAs only (Mosaic has no erf lowering): clamp to
    |z| <= 3, odd polynomial z*P(z^2). |err| <= 3e-5 (plus 2.2e-5 tail
    saturation) — far below the bf16 resolution of the surrounding compute."""
    z = jnp.clip(z, -3.0, 3.0)
    u = z * z
    p = _ERF_POLY[-1]
    for c in _ERF_POLY[-2::-1]:
        p = p * u + c
    return z * p


def _gelu_kernel_f32(x32):
    """In-kernel erf-GELU: |err| <= ~1.5e-5 * max(|x|, 1) vs exact — far
    below the bf16 resolution of the surrounding compute."""
    return x32 * 0.5 * (1.0 + _erf_poly(x32 * (2.0 ** -0.5)))


# ---------------------------------------------------------------------------
# fused LN + QKV + divided attention
# ---------------------------------------------------------------------------

def _fused_attn_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref,
                       qkv_scratch, *, mode: str, num_frames: int,
                       n_tokens: int, heads_per_block: int, head_dim: int,
                       segs: int, n_blocks: int, eps: float):
    f, n, dh = num_frames, n_tokens, head_dim
    segs_, seq, d = x_ref.shape
    dtype = x_ref.dtype
    width = heads_per_block * dh
    hi = pl.program_id(1)

    # LN + the full QKV projection run ONCE per x tile (at the first
    # head-block step); the result persists in VMEM scratch across the
    # sequential hi steps of the same bi
    @pl.when(hi == 0)
    def _compute_qkv():
        # (1, D) operands broadcast against the trailing dims — keeps
        # everything >= 2-D for Mosaic
        ln = layer_norm(x_ref[...], g_ref[...], b_ref[...], eps, dtype)
        y = jnp.dot(ln.reshape(segs * seq, d), w_ref[...],
                    preferred_element_type=jnp.float32)
        y = y + bias_ref[...].astype(jnp.float32)
        qkv_scratch[...] = y.astype(dtype).reshape(segs, seq, 3 * d)

    q_all = qkv_scratch[:, :, pl.ds(hi * width, width)]
    k_all = qkv_scratch[:, :, pl.ds(d + hi * width, width)]
    v_all = qkv_scratch[:, :, pl.ds(2 * d + hi * width, width)]

    scale = jnp.asarray(dh ** -0.5, dtype)
    for hp in range(heads_per_block):
        c0 = hp * dh
        q = q_all[:, :, c0:c0 + dh] * scale
        k = k_all[:, :, c0:c0 + dh]
        v = v_all[:, :, c0:c0 + dh]
        if mode == "space":
            for s in range(segs):
                _space_segment(q[s], k[s], v[s], o_ref, s, c0, f, n)
        else:
            _time_block(q, k, v, o_ref, c0, f, n, segs)


def _fused_attention_pallas(x, ln_scale, ln_bias, w_qkv, b_qkv,
                            num_heads: int, num_frames: int, mode: str,
                            eps: float, segs_per_block: int = 4):
    """x: (B, N, D); w_qkv: (D, 3D) packed [q|k|v]; returns (B, N, D).

    Grid (b/SEGS, n_head_blocks) with the head axis SEQUENTIAL ('arbitrary'):
    LN + the QKV matmul run once per x tile into VMEM scratch (full-width
    single-program blocks measured a ~6x Mosaic compile blowup from the
    unrolled per-head attention; per-head-block programs without the scratch
    re-ran the LN n_blocks times on the VPU and lost to the unfused path)."""
    b, seq, d = x.shape
    dh = d // num_heads
    f = num_frames
    n = (seq - 1) // f
    assert 1 + f * n == seq

    hpb = max(1, 128 // dh)
    if num_heads % hpb != 0 or (dh * hpb) % 128 != 0:
        hpb = num_heads
    n_blocks = num_heads // hpb
    width = hpb * dh
    while segs_per_block > 1 and b % segs_per_block != 0:
        segs_per_block //= 2

    kernel = functools.partial(
        _fused_attn_kernel, mode=mode, num_frames=f, n_tokens=n,
        heads_per_block=hpb, head_dim=dh, segs=segs_per_block,
        n_blocks=n_blocks, eps=eps)

    x_spec = pl.BlockSpec((segs_per_block, seq, d), lambda bi, hi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda bi, hi: (0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((d, 3 * d), lambda bi, hi: (0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 3 * d), lambda bi, hi: (0, 0),
                             memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b // segs_per_block, n_blocks),
        in_specs=[x_spec, vec_spec, vec_spec, w_spec, bias_spec],
        out_specs=pl.BlockSpec((segs_per_block, seq, width),
                               lambda bi, hi: (bi, 0, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, seq, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((segs_per_block, seq, 3 * d), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
    )(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
      w_qkv, b_qkv.reshape(1, 3 * d))


def _fused_attention_ref(x, ln_scale, ln_bias, w_qkv, b_qkv,
                         num_heads: int, num_frames: int, mode: str, eps: float):
    """XLA-composed reference: manual LN + manual Dense + the round-1
    pallas-fwd/pallas-bwd divided attention. Used as the gradient source."""
    ln = layer_norm(x, ln_scale, ln_bias, eps, x.dtype)
    qkv = dense(ln, w_qkv, b_qkv, x.dtype)
    return divided_attention(qkv, num_heads, num_frames, mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_divided_attention_vjp(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                 num_heads: int, num_frames: int, mode: str,
                                 eps: float = 1e-6):
    return _fused_attention_pallas(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                   num_heads, num_frames, mode, eps)


def fused_divided_attention(x, ln_scale, ln_bias, w_qkv, b_qkv,
                            num_heads: int, num_frames: int, mode: str,
                            eps: float = 1e-6):
    """LayerNorm -> QKV projection -> divided attention, one pallas kernel.

    x: (B, N, D) raw block input (PRE-norm); ln_scale/ln_bias: (D,);
    w_qkv: (D, 3D); b_qkv: (3D,). Returns (B, N, D) attention outputs ready
    for the output projection (residual NOT added). Runs per data shard
    under an active data mesh (parallel/mesh.py::data_sharded_kernel)."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    return data_sharded_kernel(
        lambda *a: _fused_divided_attention_vjp(
            *a, num_heads=num_heads, num_frames=num_frames, mode=mode, eps=eps),
        batched=(0,), replicated=(1, 2, 3, 4))(x, ln_scale, ln_bias,
                                               w_qkv, b_qkv)


def _fused_attn_fwd(x, ln_scale, ln_bias, w_qkv, b_qkv,
                    num_heads, num_frames, mode, eps):
    out = _fused_attention_pallas(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                  num_heads, num_frames, mode, eps)
    return out, (x, ln_scale, ln_bias, w_qkv, b_qkv)


def _fused_attn_bwd(num_heads, num_frames, mode, eps, res, g):
    x, ln_scale, ln_bias, w_qkv, b_qkv = res
    _, vjp = jax.vjp(
        lambda *a: _fused_attention_ref(*a, num_heads=num_heads,
                                        num_frames=num_frames, mode=mode,
                                        eps=eps),
        x, ln_scale, ln_bias, w_qkv, b_qkv)
    return vjp(g)


_fused_divided_attention_vjp.defvjp(_fused_attn_fwd, _fused_attn_bwd)


# ---------------------------------------------------------------------------
# fused LN + MLP + residual
# ---------------------------------------------------------------------------

def _fused_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref, *, eps: float):
    dtype = x_ref.dtype
    x = x_ref[0]  # (seq, D)
    ln = layer_norm(x, g_ref[...], b_ref[...], eps, dtype)
    h32 = jnp.dot(ln, w1_ref[...], preferred_element_type=jnp.float32)
    h32 = h32 + b1_ref[...].astype(jnp.float32)
    h = _gelu_kernel_f32(h32).astype(dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    o_ref[0] = x + y.astype(dtype)  # residual folded in


def _fused_mlp_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float):
    b, seq, d = x.shape
    hdim = w1.shape[1]
    kernel = functools.partial(_fused_mlp_kernel, eps=eps)
    vec = lambda n: pl.BlockSpec((1, n), lambda bi: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda bi: (0, 0),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, seq, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d), mat(d, hdim), vec(hdim), mat(hdim, d), vec(d)],
        out_specs=pl.BlockSpec((1, seq, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, seq, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=128 * 1024 * 1024),
    )(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
      w1, b1.reshape(1, hdim), w2, b2.reshape(1, d))


def _fused_mlp_ref(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float):
    ln = layer_norm(x, ln_scale, ln_bias, eps, x.dtype)
    h32 = dense(ln, w1, b1, x.dtype).astype(jnp.float32)
    h = exact_gelu_f32(h32).astype(x.dtype)
    return x + dense(h, w2, b2, x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_mlp_vjp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float = 1e-6):
    return _fused_mlp_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, eps)


def fused_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float = 1e-6):
    """x + fc2(exact_gelu(fc1(LN(x)))) in one pallas kernel (no dropout —
    callers gate on the dropout-inactive/deterministic path). Runs per data
    shard under an active data mesh (parallel/mesh.py::data_sharded_kernel)."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    return data_sharded_kernel(
        lambda *a: _fused_mlp_vjp(*a, eps=eps),
        batched=(0,), replicated=(1, 2, 3, 4, 5, 6))(x, ln_scale, ln_bias,
                                                     w1, b1, w2, b2)


def _fused_mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    out = _fused_mlp_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fused_mlp_bwd(eps, res, g):
    _, vjp = jax.vjp(lambda *a: _fused_mlp_ref(*a, eps=eps), *res)
    return vjp(g)


_fused_mlp_vjp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
