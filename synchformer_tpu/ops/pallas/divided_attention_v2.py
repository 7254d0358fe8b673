"""Divided space-time attention, v2: pair-slab layout, contiguous DMA.

Profiling the v1 kernels (column-sliced BlockSpecs over the packed
(B, N, 3D) QKV) on a v5e showed both modes stuck at ~5-10% MXU
utilization: a (segs, seq, 128) column block of a row-major array is a
strided DMA with 256-byte chunks, and the per-head 64-lane slices inside
the block relayout every operand. v2 changes the DATA LAYOUT between the
QKV projection and the attention instead of fighting the DMA:

- ``fused_ln_qkv_slabs`` fuses the pre-attention LayerNorm INTO the QKV
  matmul (the normalized activations never reach HBM) and writes the
  result as head-PAIR slabs (P, B*N, 3W): slab p = [q|k|v] for the pair
  of heads sharing one 128-lane group (W = 128 for head_dim 64). Each
  slab is contiguous, so the attention kernel's per-pair blocks are
  perfectly sequential DMA, and every in-kernel slice starts at a
  multiple of 128 lanes.
- ``divided_attention_slabs`` grids over (segment-blocks, pairs); heads
  inside a pair are separated by LANE MASKING, not slicing: the logits
  matmul contracts the full 128 lanes with the other head's lanes zeroed
  on the Q side (zeros kill the cross terms), and the PV matmul zeroes
  the V side so the two heads' outputs land packed in their own 64-lane
  halves of one (rows, 128) result. Output is (P, B, N, W) pair-major;
  the caller contracts it straight into the output projection with
  einsum('pbnw,pwd->bnd', out, W_proj.reshape(P, W, D)) — no transpose
  of the activations is ever materialized by the kernel.

Modes (semantics identical to models/motionformer.py::DividedAttention,
ref: motionformer_src/vit_helper.py:80-158):
- space: per-frame attention over n tokens (+ CLS folded into every
  softmax), batched over frames with one dot_general.
- time: per-position attention over f frames; 16 positions are grouped
  into one (f*16, f*16) masked MXU matmul (iota grid mask
  row%16 == col%16) — the streaming VPU formulation is bandwidth-starved
  at f=8 (see divided_attention.py).

Training: ``divided_attention_v2`` wires a jax.custom_vjp whose backward
converts the slab layout to the packed v1 layout and reuses the verified
v1 backward kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synchformer_tpu.ops.pallas.fused_block import dense, layer_norm


def lane_group_width(num_heads: int, head_dim: int) -> int | None:
    """Lane-group width W (>=128) if the head layout is groupable, else
    None (fall back to v1)."""
    hpg = max(1, 128 // head_dim)
    if num_heads % hpg != 0 or (head_dim * hpg) % 128 != 0:
        return None
    return hpg * head_dim


# ---------------------------------------------------------------------------
# fused LN + QKV projection -> pair slabs
# ---------------------------------------------------------------------------

def _ln_qkv_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *,
                   eps: float, width: int, d: int):
    dtype = x_ref.dtype
    ln = layer_norm(x_ref[...], g_ref[0], b_ref[0], eps, dtype)
    y = jnp.dot(ln, w_ref[...], preferred_element_type=jnp.float32)
    y = (y + bias_ref[0].astype(jnp.float32)).astype(o_ref.dtype)
    for p in range(d // width):
        c = p * width
        o_ref[p] = jnp.concatenate(
            [y[:, c:c + width], y[:, d + c:d + c + width],
             y[:, 2 * d + c:2 * d + c + width]], axis=-1)


def _ln_qkv_slabs_pallas(x, g, b, w, bias, width: int, eps: float):
    *lead, d = x.shape
    x2 = x.reshape(-1, d)
    n_rows = x2.shape[0]
    n_pairs = d // width
    rows = 0
    for r in range(8, min(1024, n_rows) + 1, 8):
        if n_rows % r == 0:
            rows = r
    if rows == 0:
        # no multiple-of-8 row chunking exists (e.g. tiny test batches):
        # XLA composition, same numerics
        return qkv_slabs_ref(x, g, b, w, bias, width, eps)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps, width=width, d=d),
        grid=(n_rows // rows,),
        in_specs=[pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d),
                  pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(3 * d)],
        out_specs=pl.BlockSpec((n_pairs, rows, 3 * width), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pairs, n_rows, 3 * width), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x2, g.reshape(1, d), b.reshape(1, d), w.astype(x.dtype),
      bias.reshape(1, 3 * d))
    return out  # (P, B*N, 3W)


def qkv_slabs_ref(x, g, b, w, bias, width: int, eps: float = 1e-6):
    """XLA reference for the slab layout (used by tests and the backward)."""
    *lead, d = x.shape
    if g is not None:
        x = layer_norm(x, g, b, eps, x.dtype)
    y = dense(x, w, bias, x.dtype).reshape(-1, 3 * d)
    qs, ks, vs = jnp.split(y, 3, axis=-1)
    n_pairs = d // width
    stack = lambda t: t.reshape(-1, n_pairs, width).swapaxes(0, 1)
    return jnp.concatenate([stack(qs), stack(ks), stack(vs)], axis=-1)


def slabs_to_packed(slabs, d: int):
    """(P, R, 3W) pair-slab -> (R, 3D) packed [q|k|v] head-major (v1 layout)."""
    n_pairs, r, threew = slabs.shape
    w = threew // 3
    q, k, v = jnp.split(slabs, 3, axis=-1)  # each (P, R, W)
    join = lambda t: t.swapaxes(0, 1).reshape(r, d)
    return jnp.concatenate([join(q), join(k), join(v)], axis=-1)


# ---------------------------------------------------------------------------
# attention over pair slabs
# ---------------------------------------------------------------------------

def _grid_mask(rows_n: int, gw: int):
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows_n, rows_n), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (rows_n, rows_n), 1)
    return (rr % gw) == (cc % gw)


def _lane_masks(width: int, head_dim: int, dtype):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    return [(lanes // head_dim == i).astype(dtype)
            for i in range(width // head_dim)]


def _cls_row_paired(q, k, v, masks):
    """CLS query attends to all tokens; per-head via lane masking."""
    out = jnp.zeros((1, q.shape[-1]), jnp.float32)
    for qm in masks:
        logits = jnp.dot(q * qm, k.T, preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        out = out + jnp.dot(probs, v * qm.astype(v.dtype),
                            preferred_element_type=jnp.float32)
    return out


def _space_pair(q, k, v, o_ref, s: int, masks, f: int, n: int):
    w = q.shape[-1]
    o_ref[0, s, 0:1, :] = _cls_row_paired(q[0:1], k, v, masks).astype(o_ref.dtype)
    k0 = k[0:1]
    qf = q[1:].reshape(f, n, w)
    kf = k[1:].reshape(f, n, w)
    vf = v[1:].reshape(f, n, w)
    qk = (((2,), (2,)), ((0,), (0,)))  # contract lanes, batch frames
    pv = (((2,), (1,)), ((0,), (0,)))  # contract keys axis, batch frames
    out = jnp.zeros((f, n, w), jnp.float32)
    for qm in masks:
        qfm = qf * qm[None]
        logits = jax.lax.dot_general(qfm, kf, qk,
                                     preferred_element_type=jnp.float32)
        cls_logit = jnp.sum(qfm * k0[None].astype(qf.dtype), axis=-1,
                            keepdims=True, dtype=jnp.float32)      # (f, n, 1)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
        ep = jnp.exp(logits - m)
        ec = jnp.exp(cls_logit - m)
        denom = jnp.sum(ep, axis=-1, keepdims=True) + ec
        vfm = vf * qm[None].astype(vf.dtype)
        v0m = (v[0:1] * qm.astype(v.dtype))[None].astype(jnp.float32)
        out = out + (jax.lax.dot_general(ep.astype(q.dtype), vfm, pv,
                                         preferred_element_type=jnp.float32)
                     + ec * v0m) / denom
    o_ref[0, s, 1:, :] = out.reshape(f * n, w).astype(o_ref.dtype)


def _time_pair(q, k, v, o_ref, s: int, masks, head_dim: int, f: int, n: int,
               group: int = 16):
    w = q.shape[-1]
    o_ref[0, s, 0:1, :] = _cls_row_paired(q[0:1], k, v, masks).astype(o_ref.dtype)
    k0 = k[0:1]
    neg = jnp.float32(-1e30)
    gmasks = {}
    for g0 in range(0, n, group):
        gw = min(group, n - g0)
        rows_n = f * gw
        if gw not in gmasks:
            gmasks[gw] = _grid_mask(rows_n, gw)
        qg = jnp.concatenate(
            [q[1 + j * n + g0:1 + j * n + g0 + gw] for j in range(f)], 0)
        kg = jnp.concatenate(
            [k[1 + j * n + g0:1 + j * n + g0 + gw] for j in range(f)], 0)
        vg = jnp.concatenate(
            [v[1 + j * n + g0:1 + j * n + g0 + gw] for j in range(f)], 0)
        out = jnp.zeros((rows_n, w), jnp.float32)
        for qm in masks:
            qgm = qg * qm
            logits = jnp.dot(qgm, kg.T, preferred_element_type=jnp.float32)
            logits = jnp.where(gmasks[gw], logits, neg)
            cls_logit = jnp.sum(qgm * k0, axis=-1, keepdims=True,
                                dtype=jnp.float32)
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
            ep = jnp.exp(logits - m)
            ec = jnp.exp(cls_logit - m)
            denom = jnp.sum(ep, axis=-1, keepdims=True) + ec
            vgm = vg * qm.astype(vg.dtype)
            v0m = (v[0:1] * qm.astype(v.dtype)).astype(jnp.float32)
            out = out + (jnp.dot(ep.astype(q.dtype), vgm,
                                 preferred_element_type=jnp.float32)
                         + ec * v0m) / denom
        out = out.astype(o_ref.dtype)
        for j in range(f):
            o_ref[0, s, 1 + j * n + g0:1 + j * n + g0 + gw, :] = (
                out[j * gw:(j + 1) * gw])


def _slab_kernel(x_ref, o_ref, *, mode: str, num_frames: int, n_tokens: int,
                 head_dim: int, width: int, segs: int):
    scale = jnp.asarray(head_dim ** -0.5, x_ref.dtype)
    masks = _lane_masks(width, head_dim, x_ref.dtype)
    for s in range(segs):
        q = x_ref[0, s, :, 0:width] * scale
        k = x_ref[0, s, :, width:2 * width]
        v = x_ref[0, s, :, 2 * width:3 * width]
        if mode == "space":
            _space_pair(q, k, v, o_ref, s, masks, num_frames, n_tokens)
        else:
            _time_pair(q, k, v, o_ref, s, masks, head_dim,
                       num_frames, n_tokens)


def divided_attention_slabs(slabs: jnp.ndarray, b: int, head_dim: int,
                            num_frames: int, mode: str,
                            segs_per_block: int = 2) -> jnp.ndarray:
    """slabs: (P, B*N, 3W) from ``fused_ln_qkv_slabs``. Returns (P, B, N, W)
    pair-major attention outputs."""
    n_pairs, rows, threew = slabs.shape
    width = threew // 3
    seq = rows // b
    f = num_frames
    n = (seq - 1) // f
    assert 1 + f * n == seq
    x = slabs.reshape(n_pairs, b, seq, threew)
    while segs_per_block > 1 and b % segs_per_block != 0:
        segs_per_block //= 2

    kernel = functools.partial(_slab_kernel, mode=mode, num_frames=f,
                               n_tokens=n, head_dim=head_dim, width=width,
                               segs=segs_per_block)
    return pl.pallas_call(
        kernel,
        grid=(b // segs_per_block, n_pairs),
        in_specs=[pl.BlockSpec((1, segs_per_block, seq, threew),
                               lambda bi, p: (p, bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, segs_per_block, seq, width),
                               lambda bi, p: (p, bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pairs, b, seq, width), slabs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


# ---------------------------------------------------------------------------
# differentiable wrapper (forward: slab kernels; backward: v1 kernels)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def divided_attention_v2(slabs, b: int, head_dim: int, num_frames: int,
                         mode: str):
    """Differentiable slab-layout divided attention. slabs (P, B*N, 3W) ->
    (P, B, N, W)."""
    return divided_attention_slabs(slabs, b, head_dim, num_frames, mode)


def _v2_fwd(slabs, b, head_dim, num_frames, mode):
    return divided_attention_slabs(slabs, b, head_dim, num_frames, mode), slabs


def _v2_bwd(b, head_dim, num_frames, mode, slabs, g):
    from synchformer_tpu.ops.pallas.divided_attention_bwd import (
        _divided_attention_bwd_pallas,
    )
    n_pairs, rows, threew = slabs.shape
    w = threew // 3
    d = n_pairs * w
    seq = rows // b
    num_heads = d // head_dim
    qkv = slabs_to_packed(slabs, d).reshape(b, seq, 3 * d)
    # g: (P, B, N, W) -> packed (B, N, D)
    gp = g.reshape(n_pairs, rows, w).swapaxes(0, 1).reshape(b, seq, d)
    dqkv = _divided_attention_bwd_pallas(qkv, gp, num_heads, num_frames, mode)
    dq, dk, dv = jnp.split(dqkv.reshape(rows, 3 * d), 3, axis=-1)
    stack = lambda t: t.reshape(rows, n_pairs, w).swapaxes(0, 1)
    dslabs = jnp.concatenate([stack(dq), stack(dk), stack(dv)], axis=-1)
    return (dslabs,)


divided_attention_v2.defvjp(_v2_fwd, _v2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_ln_qkv_slabs(x, g, b, w, bias, width: int, eps: float = 1e-6):
    """slab_qkv(LayerNorm(x)): LN fused into the QKV matmul, output in
    pair-slab layout (P, B*N, 3W). Differentiable (backward via the XLA
    reference composition)."""
    return _ln_qkv_slabs_pallas(x, g, b, w, bias, width, eps)


def _ln_qkv_fwd(x, g, b, w, bias, width, eps):
    return _ln_qkv_slabs_pallas(x, g, b, w, bias, width, eps), (x, g, b, w, bias)


def _ln_qkv_bwd(width, eps, res, grad):
    x, g, b, w, bias = res
    _, vjp = jax.vjp(
        lambda *a: qkv_slabs_ref(*a, width=width, eps=eps), x, g, b, w, bias)
    return vjp(grad)


fused_ln_qkv_slabs.defvjp(_ln_qkv_fwd, _ln_qkv_bwd)
