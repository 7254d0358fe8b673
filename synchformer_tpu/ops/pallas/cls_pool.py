"""Fused CLS-pooling encoder layer: LN1 -> QKV -> 1-row attention -> proj
-> residual -> LN2 -> MLP -> residual, one pallas program per segment chunk.

The aggregators (ref: visual/motionformer.py:275-393, audio/ast.py:253-279)
run ONE pre-LN encoder layer and keep only the CLS row. Round 4 specialized
the XLA path to CLS-only queries (PreLNBlock query_rows=1), but the K/V side
still pays full-tensor HBM traffic around ops XLA cannot fuse: at the
spatial aggregator's (896, 197, 768) the KV projection's conv-pinned output
layout forces a 1.62 ms relayout copy in front of the batched attention
dot_generals (a head-batched einsum formulation avoids the copy but loses
0.3 ms net — falsified round 5), plus separate logits/PV/LN-stat fusions.
This kernel keeps everything after the single read of x in VMEM:

    read x (chunk, N, D) -> write CLS representation (chunk, D)

Head handling without transposes: with one query row, per-head logits are
k @ (q^T * E) where E[d, h] = [d // dh == h] — the lane-masked-column trick
(one (N, D) x (D, H) MXU op replaces H batched dots), and the probability
expansion back to lanes is p @ E^T. The VPU work (LN stats of ~1.5k rows,
one (N, H) softmax per segment) is two orders of magnitude below the tower
kernels' softmax load, so the megakernel serialization that killed
fused_block.py's LN+QKV+attention does not bite here (measured: see
CLAUDE.md round-5 findings).

Numerics: shared layer_norm/dense/poly-GELU helpers from fused_block.py
(flax LN f32 stats; logits scaled in f32; probs cast to compute dtype before
PV with f32 products/accumulation — matching scaled_dot_attention). Backward
re-derives through the XLA-composed reference via jax.custom_vjp, exactly
like fused_block.py / fused_rows.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synchformer_tpu.ops.pallas.fused_block import (
    _gelu_kernel_f32,
    dense,
    exact_gelu_f32,
    layer_norm,
)


def _seg_chunk(bsz: int, n: int, target_rows: int = 2048) -> int:
    """Segments per program: batch enough (N, D) slabs to amortize the
    per-program overhead (~target_rows rows of work), bounded by what
    divides the batch. At the spatial aggregator (N=197) this is 8; at the
    AST frequency aggregator (N=13, B=672) it is 16 — the N=13 slabs are
    tiny and 84 single-digit-row programs were pure dispatch overhead
    (0.76 ms for ~0.1 ms of matmul, measured). Capped at 16: the segment
    loop unrolls in the kernel body and Mosaic compile time blows up on
    very long unrolls (round-2 finding on the per-head unroll)."""
    cap = max(1, min(bsz, 16, target_rows // max(n, 1)))
    best = 0
    for r in range(1, cap + 1):
        # the (segs, D) output block is only a legal Mosaic block shape if
        # segs is a sublane multiple or covers the whole array (regression:
        # Stage-I's (28, 9, 768) temporal agg picked segs=14 and failed to
        # lower); callers fall back to the XLA composition on 0
        if bsz % r == 0 and (r % 8 == 0 or r == bsz):
            best = r
    return best


def _cls_pool_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wp_ref,
                     bp_ref, g2_ref, b2_ref, w1_ref, fb1_ref, w2_ref, fb2_ref,
                     o_ref, *, eps: float, num_heads: int, segs: int):
    segs_, n, d = x_ref.shape
    dh = d // num_heads
    dtype = x_ref.dtype
    scale = dh ** -0.5

    # head masks from iota (constants after Mosaic folding):
    # E (D, H): lane d belongs to head d // dh;  ET (H, D): its transpose
    e_dh = (jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 0) // dh
            == jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 1))
    e_hd = (jax.lax.broadcasted_iota(jnp.int32, (num_heads, d), 1) // dh
            == jax.lax.broadcasted_iota(jnp.int32, (num_heads, d), 0))
    E = e_dh.astype(dtype)
    ET = e_hd.astype(dtype)

    cls_rows = []
    for s in range(segs):
        x = x_ref[s]                                     # (N, D)
        ln = layer_norm(x, g1_ref[0], b1_ref[0], eps, dtype)
        kv32 = jnp.dot(ln, wqkv_ref[:, d:],
                       preferred_element_type=jnp.float32)
        kv = (kv32 + bqkv_ref[0, d:].astype(jnp.float32)).astype(dtype)
        q32 = jnp.dot(ln[0:1], wqkv_ref[:, :d],
                      preferred_element_type=jnp.float32)
        q = (q32 + bqkv_ref[0, :d].astype(jnp.float32)).astype(dtype)  # (1, D)
        k = kv[:, :d]
        v = kv[:, d:]
        # logits[n, h] = sum_d k[n,d]*q[d]*E[d,h]: a lane-broadcast multiply
        # + one (N, D) x (D, H) reduction — no (1, D) -> (D, 1) transpose,
        # which Mosaic cannot lower (tpu.reshape 1x768 -> 768x1). Products
        # in f32 of the bf16 operands = exactly the MXU semantics of the
        # reference einsum; the masked reduction is tiny (N x D x H).
        kq = k.astype(jnp.float32) * q.astype(jnp.float32)
        logits = jnp.dot(kq, E.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale  # (N, H)
        p = jax.nn.softmax(logits, axis=0).astype(dtype)
        pm = jnp.dot(p, ET, preferred_element_type=jnp.float32)  # (N, D)
        pv = pm * v.astype(jnp.float32)
        cls_rows.append(jnp.sum(pv, axis=0, keepdims=True).astype(dtype))

    att = jnp.concatenate(cls_rows, axis=0)              # (segs, D)
    att32 = jnp.dot(att, wp_ref[...], preferred_element_type=jnp.float32)
    att = (att32 + bp_ref[0].astype(jnp.float32)).astype(dtype)
    y = x_ref[:, 0, :] + att                             # residual on CLS row

    ln2 = layer_norm(y, g2_ref[0], b2_ref[0], eps, dtype)
    h32 = jnp.dot(ln2, w1_ref[...], preferred_element_type=jnp.float32)
    h = _gelu_kernel_f32(h32 + fb1_ref[0].astype(jnp.float32)).astype(dtype)
    m32 = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = y + (m32 + fb2_ref[0].astype(jnp.float32)).astype(dtype)


def _cls_pool_tokens_kernel(x_ref, cls_ref, g1_ref, b1_ref, wqkv_ref,
                            bqkv_ref, wp_ref, bp_ref, g2_ref, b2_ref, w1_ref,
                            fb1_ref, w2_ref, fb2_ref, o_ref, *, eps: float,
                            num_heads: int, segs: int):
    """Tokens + shared CLS-vector variant: the (B, 1+M, D) concat of
    CLSPoolEncoderLayer never materializes in HBM (0.84 ms of pure write at
    the spatial aggregator's shape). The CLS row's LN/Q/K/V are computed
    once per program and its key/value prepended to every segment's K/V in
    VMEM — same math as concat-then-pool, row-independent ops."""
    segs_, m, d = x_ref.shape
    dh = d // num_heads
    dtype = x_ref.dtype
    scale = dh ** -0.5
    e_dh = (jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 0) // dh
            == jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 1))
    e_hd = (jax.lax.broadcasted_iota(jnp.int32, (num_heads, d), 1) // dh
            == jax.lax.broadcasted_iota(jnp.int32, (num_heads, d), 0))
    Ef = e_dh.astype(jnp.float32)
    ET = e_hd.astype(dtype)

    cls = cls_ref[...]                                   # (1, D)
    ln_c = layer_norm(cls, g1_ref[0], b1_ref[0], eps, dtype)
    q32 = jnp.dot(ln_c, wqkv_ref[:, :d], preferred_element_type=jnp.float32)
    q = (q32 + bqkv_ref[0, :d].astype(jnp.float32)).astype(dtype)
    kvc32 = jnp.dot(ln_c, wqkv_ref[:, d:], preferred_element_type=jnp.float32)
    kv_c = (kvc32 + bqkv_ref[0, d:].astype(jnp.float32)).astype(dtype)
    qf = q.astype(jnp.float32)

    cls_rows = []
    for s in range(segs):
        x = x_ref[s]                                     # (M, D)
        ln = layer_norm(x, g1_ref[0], b1_ref[0], eps, dtype)
        kv32 = jnp.dot(ln, wqkv_ref[:, d:],
                       preferred_element_type=jnp.float32)
        kv = (kv32 + bqkv_ref[0, d:].astype(jnp.float32)).astype(dtype)
        kv_full = jnp.concatenate([kv_c, kv], axis=0)    # (1+M, 2D) in VMEM
        k = kv_full[:, :d]
        v = kv_full[:, d:]
        kq = k.astype(jnp.float32) * qf
        logits = jnp.dot(kq, Ef,
                         preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits, axis=0).astype(dtype)
        pm = jnp.dot(p, ET, preferred_element_type=jnp.float32)
        pv = pm * v.astype(jnp.float32)
        cls_rows.append(jnp.sum(pv, axis=0, keepdims=True).astype(dtype))

    att = jnp.concatenate(cls_rows, axis=0)              # (segs, D)
    att32 = jnp.dot(att, wp_ref[...], preferred_element_type=jnp.float32)
    att = (att32 + bp_ref[0].astype(jnp.float32)).astype(dtype)
    y = jnp.broadcast_to(cls.astype(dtype), (segs_, d)) + att

    ln2 = layer_norm(y, g2_ref[0], b2_ref[0], eps, dtype)
    h32 = jnp.dot(ln2, w1_ref[...], preferred_element_type=jnp.float32)
    h = _gelu_kernel_f32(h32 + fb1_ref[0].astype(jnp.float32)).astype(dtype)
    m32 = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = y + (m32 + fb2_ref[0].astype(jnp.float32)).astype(dtype)


def _cls_pool_tokens_pallas(x, cls, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1,
                            fb1, w2, fb2, num_heads: int, eps: float):
    bsz, m, d = x.shape
    hdim = w1.shape[1]
    segs = _seg_chunk(bsz, m + 1)
    if segs == 0:
        return _cls_pool_tokens_ref(x, cls, g1, b1, wqkv, bqkv, wp, bp, g2,
                                    b2, w1, fb1, w2, fb2, num_heads, eps)
    vec = lambda mm: pl.BlockSpec((1, mm), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    kernel = functools.partial(_cls_pool_tokens_kernel, eps=eps,
                               num_heads=num_heads, segs=segs)
    return pl.pallas_call(
        kernel,
        grid=(bsz // segs,),
        in_specs=[pl.BlockSpec((segs, m, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d),
                  vec(d), vec(d), mat(d, 3 * d), vec(3 * d),
                  mat(d, d), vec(d), vec(d), vec(d),
                  mat(d, hdim), vec(hdim), mat(hdim, d), vec(d)],
        out_specs=pl.BlockSpec((segs, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, cls.reshape(1, d).astype(x.dtype), g1.reshape(1, d),
      b1.reshape(1, d), wqkv.astype(x.dtype), bqkv.reshape(1, 3 * d),
      wp.astype(x.dtype), bp.reshape(1, d), g2.reshape(1, d),
      b2.reshape(1, d), w1.astype(x.dtype), fb1.reshape(1, hdim),
      w2.astype(x.dtype), fb2.reshape(1, d))


def _cls_pool_tokens_ref(x, cls, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1,
                         w2, fb2, num_heads: int, eps: float):
    bsz, m, d = x.shape
    full = jnp.concatenate(
        [jnp.broadcast_to(cls.reshape(1, 1, d).astype(x.dtype),
                          (bsz, 1, d)), x], axis=1)
    return _cls_pool_ref(full, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1,
                         w2, fb2, num_heads, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15))
def _cls_pool_tokens_vjp(x, cls, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1,
                         w2, fb2, num_heads: int, eps: float):
    return _cls_pool_tokens_pallas(x, cls, g1, b1, wqkv, bqkv, wp, bp, g2,
                                   b2, w1, fb1, w2, fb2, num_heads, eps)


def fused_cls_pool_tokens(x, cls, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1,
                          fb1, w2, fb2, num_heads: int, eps: float = 1e-6):
    """CLS pooling over (B, M, D) tokens with the learnable CLS vector fed
    separately — equivalent to prepending it and calling fused_cls_pool,
    without ever materializing the (B, 1+M, D) concat. Deterministic path
    only. Runs per data shard under an active data mesh."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    return data_sharded_kernel(
        lambda *a: _cls_pool_tokens_vjp(*a, num_heads=num_heads, eps=eps),
        batched=(0,), replicated=tuple(range(1, 14)))(
            x, cls, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1, w2, fb2)


def _cls_pool_tokens_fwd(x, cls, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1,
                         w2, fb2, num_heads, eps):
    out = _cls_pool_tokens_pallas(x, cls, g1, b1, wqkv, bqkv, wp, bp, g2, b2,
                                  w1, fb1, w2, fb2, num_heads, eps)
    return out, (x, cls, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1, w2, fb2)


def _cls_pool_tokens_bwd(num_heads, eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: _cls_pool_tokens_ref(*a, num_heads=num_heads, eps=eps),
        *res)
    return vjp(g)


_cls_pool_tokens_vjp.defvjp(_cls_pool_tokens_fwd, _cls_pool_tokens_bwd)


def _cls_pool_pallas(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1, w2, fb2,
                     num_heads: int, eps: float):
    bsz, n, d = x.shape
    hdim = w1.shape[1]
    segs = _seg_chunk(bsz, n)
    if segs == 0:
        return _cls_pool_ref(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1,
                             w2, fb2, num_heads, eps)
    vec = lambda m: pl.BlockSpec((1, m), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    kernel = functools.partial(_cls_pool_kernel, eps=eps,
                               num_heads=num_heads, segs=segs)
    return pl.pallas_call(
        kernel,
        grid=(bsz // segs,),
        in_specs=[pl.BlockSpec((segs, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d), mat(d, 3 * d), vec(3 * d),
                  mat(d, d), vec(d), vec(d), vec(d),
                  mat(d, hdim), vec(hdim), mat(hdim, d), vec(d)],
        out_specs=pl.BlockSpec((segs, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, g1.reshape(1, d), b1.reshape(1, d), wqkv.astype(x.dtype),
      bqkv.reshape(1, 3 * d), wp.astype(x.dtype), bp.reshape(1, d),
      g2.reshape(1, d), b2.reshape(1, d), w1.astype(x.dtype),
      fb1.reshape(1, hdim), w2.astype(x.dtype), fb2.reshape(1, d))


def _cls_pool_ref(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1, w2, fb2,
                  num_heads: int, eps: float):
    """XLA-composed reference — the exact PreLNBlock(query_rows=1) math
    (models/layers.py): gradient source for the custom VJP and the
    interpret-mode equality oracle."""
    d = x.shape[-1]
    dh = d // num_heads
    dtype = x.dtype
    ln = layer_norm(x, g1, b1, eps, dtype)
    q = dense(ln[:, :1], wqkv[:, :d].astype(dtype), bqkv[:d], dtype)
    kv = dense(ln, wqkv[:, d:].astype(dtype), bqkv[d:], dtype)
    bsz, n, _ = x.shape
    q = q.reshape(bsz, 1, num_heads, dh)
    k = kv[..., :d].reshape(bsz, n, num_heads, dh)
    v = kv[..., d:].reshape(bsz, n, num_heads, dh)
    logits = jnp.einsum("bqhd,bnhd->bhqn", q, k,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
    p = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqn,bnhd->bqhd", p, v).reshape(bsz, 1, d)
    att = dense(out, wp.astype(dtype), bp, dtype)[:, 0]
    y = x[:, 0, :] + att
    ln2 = layer_norm(y, g2, b2, eps, dtype)
    h32 = dense(ln2, w1.astype(dtype), fb1, dtype).astype(jnp.float32)
    h = exact_gelu_f32(h32).astype(dtype)
    return y + dense(h, w2.astype(dtype), fb2, dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def _cls_pool_vjp(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1, w2, fb2,
                  num_heads: int, eps: float):
    return _cls_pool_pallas(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1,
                            w2, fb2, num_heads, eps)


def fused_cls_pool(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1, w2, fb2,
                   num_heads: int, eps: float = 1e-6):
    """CLS representation of one pre-LN encoder layer, (B, N, D) -> (B, D),
    everything after the read of x resident in VMEM. Deterministic path only
    (callers gate on dropout-inactive). Runs per data shard under an active
    data mesh (parallel/mesh.py::data_sharded_kernel)."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    return data_sharded_kernel(
        lambda *a: _cls_pool_vjp(*a, num_heads=num_heads, eps=eps),
        batched=(0,), replicated=tuple(range(1, 13)))(
            x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1, w2, fb2)


def _cls_pool_fwd(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1, w2, fb2,
                  num_heads, eps):
    out = _cls_pool_pallas(x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1,
                           w2, fb2, num_heads, eps)
    return out, (x, g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, fb1, w2, fb2)


def _cls_pool_bwd(num_heads, eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: _cls_pool_ref(*a, num_heads=num_heads, eps=eps), *res)
    return vjp(g)


_cls_pool_vjp.defvjp(_cls_pool_fwd, _cls_pool_bwd)
