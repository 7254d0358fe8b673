"""Backward Pallas kernels + custom VJP for the fused divided attention.

Mirrors the forward kernels in divided_attention.py: same grid, same
column-sliced BlockSpecs over the packed QKV, recompute-based (flash-style —
no probabilities are ever materialized in HBM). The CLS token appears in
three roles and all three gradient paths are handled:

  1. CLS row: the CLS query attends to every token (dq0, dK, dV terms)
  2. CLS key/value joined to every group: softmax over [group | CLS] is
     differentiated as an extended distribution (dk0, dv0 accumulation)
  3. group tokens: standard attention backward within each group

Wired up as jax.custom_vjp in ``divided_attention`` below; gradients match
jax.grad of the XLA reference path (tests/test_pallas_attention.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synchformer_tpu.ops.pallas.divided_attention import divided_attention_pallas


def _cls_row_bwd(q, k, v, do_cls, scale):
    """Backward of the CLS row (cls_q attends everything).
    Returns (dq0 (1,dh), dK (N,dh), dV (N,dh)) w.r.t. UNscaled q."""
    logits = jnp.dot(q[0:1], k.T, preferred_element_type=jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (1, N) f32
    p_b = p.astype(q.dtype)
    dv = jnp.dot(p_b.T, do_cls, preferred_element_type=jnp.float32)  # (N, dh)
    dp = jnp.dot(do_cls, v.T, preferred_element_type=jnp.float32)  # (1, N)
    sigma = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - sigma)).astype(q.dtype)  # (1, N)
    # q passed in is PRE-SCALED; d(raw q) needs the extra scale, d(k) does not
    dq0 = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(ds.T, q[0:1], preferred_element_type=jnp.float32)
    return dq0, dk, dv


def _space_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                      num_frames: int, n_tokens: int, heads_per_block: int,
                      head_dim: int, segs: int):
    f, n, dh = num_frames, n_tokens, head_dim
    for hp in range(heads_per_block):
        c0 = hp * dh
        scale = jnp.float32(dh ** -0.5)
        for s in range(segs):
            q_raw = q_ref[s, :, c0:c0 + dh]
            q = q_raw * jnp.asarray(dh ** -0.5, q_raw.dtype)
            k = k_ref[s, :, c0:c0 + dh]
            v = v_ref[s, :, c0:c0 + dh]
            do = do_ref[s, :, c0:c0 + dh]

            dq0, dk_cls, dv_cls = _cls_row_bwd(q, k, v, do[0:1], scale)
            dq_ref[s, 0:1, c0:c0 + dh] = dq0.astype(dq_ref.dtype)
            k0 = k[0:1]
            v0 = v[0:1]

            # all f per-frame attention backwards as BATCHED dot_generals
            # over the frame axis (an unrolled loop of small matmuls is
            # dispatch-bound on the MXU, like the forward)
            qf = q[1:].reshape(f, n, dh)
            kf = k[1:].reshape(f, n, dh)
            vf = v[1:].reshape(f, n, dh)
            dof = do[1:].reshape(f, n, dh)
            qk = (((2,), (2,)), ((0,), (0,)))   # contract dh, batch frames
            pv = (((2,), (1,)), ((0,), (0,)))   # contract keys axis
            tq = (((1,), (1,)), ((0,), (0,)))   # contract queries axis
            # recompute the forward softmax with the CLS extension term
            logits = jax.lax.dot_general(qf, kf, qk,
                                         preferred_element_type=jnp.float32)
            cls_logit = jnp.sum(qf * k0[None].astype(qf.dtype), axis=-1,
                                keepdims=True, dtype=jnp.float32)  # (f, n, 1)
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
            ep = jnp.exp(logits - m)
            ec = jnp.exp(cls_logit - m)
            denom = jnp.sum(ep, axis=-1, keepdims=True) + ec
            p = ep / denom          # (f, n, n) f32
            pc = ec / denom         # (f, n, 1) f32
            p_b = p.astype(q.dtype)

            do32 = dof.astype(jnp.float32)
            dvf = jax.lax.dot_general(p_b, dof, tq,
                                      preferred_element_type=jnp.float32)
            dv0 = jnp.sum(pc * do32, axis=(0, 1))[None]  # (1, dh)
            dp = jax.lax.dot_general(dof, vf, qk,
                                     preferred_element_type=jnp.float32)
            dpc = jnp.sum(do32 * v0[None].astype(jnp.float32), axis=-1,
                          keepdims=True)  # (f, n, 1): <do_r, v0>
            sigma = jnp.sum(p * dp, axis=-1, keepdims=True) + pc * dpc
            ds = (p * (dp - sigma)).astype(q.dtype)      # (f, n, n)
            dsc = pc * (dpc - sigma)                      # (f, n, 1) f32
            dqf = (jax.lax.dot_general(ds, kf, pv,
                                       preferred_element_type=jnp.float32)
                   + dsc * k0[None].astype(jnp.float32)) * scale
            dkf = jax.lax.dot_general(ds, qf, tq,
                                      preferred_element_type=jnp.float32)
            dk0 = jnp.sum(dsc * qf.astype(jnp.float32), axis=(0, 1))[None]

            dq_ref[s, 1:, c0:c0 + dh] = dqf.reshape(f * n, dh).astype(dq_ref.dtype)
            dk_ref[s, 1:, c0:c0 + dh] = (
                dk_cls[1:].astype(jnp.float32)
                + dkf.reshape(f * n, dh)).astype(dk_ref.dtype)
            dv_ref[s, 1:, c0:c0 + dh] = (
                dv_cls[1:].astype(jnp.float32)
                + dvf.reshape(f * n, dh)).astype(dv_ref.dtype)
            dk_ref[s, 0:1, c0:c0 + dh] = (dk_cls[0:1] + dk0).astype(dk_ref.dtype)
            dv_ref[s, 0:1, c0:c0 + dh] = (dv_cls[0:1] + dv0).astype(dv_ref.dtype)


def _time_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                     num_frames: int, n_tokens: int, heads_per_block: int,
                     head_dim: int, segs: int):
    """Per-position attention backward: two-pass streaming (recompute stats,
    then gradient pass), all (segs, n, dh) elementwise tiles like the fwd."""
    f, n, dh = num_frames, n_tokens, head_dim
    for hp in range(heads_per_block):
        c0 = hp * dh
        scale = jnp.float32(dh ** -0.5)
        # CLS rows per segment
        for s in range(segs):
            q_raw = q_ref[s, :, c0:c0 + dh]
            q = q_raw * jnp.asarray(dh ** -0.5, q_raw.dtype)
            dq0, dk_c, dv_c = _cls_row_bwd(q, k_ref[s, :, c0:c0 + dh],
                                           v_ref[s, :, c0:c0 + dh],
                                           do_ref[s, 0:1, c0:c0 + dh], scale)
            dq_ref[s, 0:1, c0:c0 + dh] = dq0.astype(dq_ref.dtype)
            dk_ref[s, :, c0:c0 + dh] = dk_c.astype(dk_ref.dtype)
            dv_ref[s, :, c0:c0 + dh] = dv_c.astype(dv_ref.dtype)

        q_all = (q_ref[:, :, c0:c0 + dh]
                 * jnp.asarray(dh ** -0.5, q_ref.dtype))  # (segs, seq, dh)
        k_all = k_ref[:, :, c0:c0 + dh]
        v_all = v_ref[:, :, c0:c0 + dh]
        k0 = k_all[:, 0:1]  # (segs, 1, dh)
        v0 = v_all[:, 0:1]

        def logit_of(qp, kc):
            return jnp.sum((qp * kc).astype(jnp.float32), axis=-1, keepdims=True)

        for cq in range(f):  # query frame
            row0 = 1 + cq * n
            qp = q_all[:, row0:row0 + n]          # (segs, n, dh)
            dof = do_ref[:, row0:row0 + n, c0:c0 + dh].astype(jnp.float32)

            # pass 1: stats (m, denom) over the f+1 candidates
            k0b = jnp.broadcast_to(k0, (segs, n, dh))
            m = logit_of(qp, k0b)
            denom = jnp.ones_like(m)  # exp(l0 - m) with m = l0
            for j in range(f):
                l = logit_of(qp, k_all[:, 1 + j * n:1 + (j + 1) * n])
                m_new = jnp.maximum(m, l)
                denom = denom * jnp.exp(m - m_new) + jnp.exp(l - m_new)
                m = m_new

            # pass 2: sigma = sum_j p_j * dp_j   (dp_j = <do, v_j>)
            v0b = jnp.broadcast_to(v0, (segs, n, dh))
            p0 = jnp.exp(logit_of(qp, k0b) - m) / denom
            dp0 = jnp.sum(dof * v0b.astype(jnp.float32), axis=-1, keepdims=True)
            sigma = p0 * dp0
            for j in range(f):
                kj = k_all[:, 1 + j * n:1 + (j + 1) * n]
                vj = v_all[:, 1 + j * n:1 + (j + 1) * n]
                pj = jnp.exp(logit_of(qp, kj) - m) / denom
                dpj = jnp.sum(dof * vj.astype(jnp.float32), axis=-1, keepdims=True)
                sigma += pj * dpj

            # pass 3: gradients
            ds0 = p0 * (dp0 - sigma)  # (segs, n, 1)
            dq = ds0 * k0b.astype(jnp.float32)
            dk_ref[:, 0:1, c0:c0 + dh] = (
                dk_ref[:, 0:1, c0:c0 + dh].astype(jnp.float32)
                + jnp.sum(ds0 * qp.astype(jnp.float32), axis=1,
                          keepdims=True)).astype(dk_ref.dtype)
            dv_ref[:, 0:1, c0:c0 + dh] = (
                dv_ref[:, 0:1, c0:c0 + dh].astype(jnp.float32)
                + jnp.sum(p0 * dof, axis=1, keepdims=True)).astype(dv_ref.dtype)
            for j in range(f):
                rows_j = slice(1 + j * n, 1 + (j + 1) * n)
                kj = k_all[:, rows_j]
                vj = v_all[:, rows_j]
                pj = jnp.exp(logit_of(qp, kj) - m) / denom
                dpj = jnp.sum(dof * vj.astype(jnp.float32), axis=-1, keepdims=True)
                dsj = pj * (dpj - sigma)
                dq += dsj * kj.astype(jnp.float32)
                dk_ref[:, rows_j, c0:c0 + dh] = (
                    dk_ref[:, rows_j, c0:c0 + dh].astype(jnp.float32)
                    + dsj * qp.astype(jnp.float32)).astype(dk_ref.dtype)
                dv_ref[:, rows_j, c0:c0 + dh] = (
                    dv_ref[:, rows_j, c0:c0 + dh].astype(jnp.float32)
                    + pj * dof).astype(dv_ref.dtype)
            dq_ref[:, row0:row0 + n, c0:c0 + dh] = (dq * scale).astype(dq_ref.dtype)


def _divided_attention_bwd_pallas(qkv, dout, num_heads: int, num_frames: int,
                                  mode: str, segs_per_block: int = 4):
    b, seq, threed = qkv.shape
    d = threed // 3
    dh = d // num_heads
    f = num_frames
    n = (seq - 1) // f
    hpb = max(1, 128 // dh)
    if num_heads % hpb != 0 or (dh * hpb) % 128 != 0:
        hpb = num_heads
    n_blocks = num_heads // hpb
    width = hpb * dh
    while segs_per_block > 1 and b % segs_per_block != 0:
        segs_per_block //= 2

    kern = _space_bwd_kernel if mode == "space" else _time_bwd_kernel
    kern = functools.partial(kern, num_frames=f, n_tokens=n,
                             heads_per_block=hpb, head_dim=dh,
                             segs=segs_per_block)

    def col_spec(which: int):
        return pl.BlockSpec((segs_per_block, seq, width),
                            lambda bi, hi, w=which: (bi, 0, w * n_blocks + hi),
                            memory_space=pltpu.VMEM)

    grad_spec = pl.BlockSpec((segs_per_block, seq, width),
                             lambda bi, hi: (bi, 0, hi),
                             memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(b // segs_per_block, n_blocks),
        in_specs=[col_spec(0), col_spec(1), col_spec(2), grad_spec],
        out_specs=(grad_spec, grad_spec, grad_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((b, seq, d), qkv.dtype)
                        for _ in range(3)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv, qkv, qkv, dout)
    return jnp.concatenate([dq, dk, dv], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def divided_attention(qkv, num_heads: int, num_frames: int, mode: str):
    """Differentiable fused divided attention: pallas forward AND backward."""
    return divided_attention_pallas(qkv, num_heads, num_frames, mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def divided_attention_split(qkv_patches, qkv_cls, num_heads: int, mode: str):
    """Differentiable split-layout divided attention (the fastest forward):
    qkv_patches (B, f, n, 3D) + qkv_cls (B, 1, 3D) -> (patches (B, f, n, D),
    cls (B, 1, D)). Backward converts to the packed layout and reuses the
    verified v1 backward kernels (the conversion copies only run when
    gradients actually flow — frozen towers never pay it)."""
    from synchformer_tpu.ops.pallas.divided_attention import (
        divided_attention_pallas_4d,
    )

    return divided_attention_pallas_4d(qkv_patches, qkv_cls, num_heads, mode)


def _fwd_split(qkv_patches, qkv_cls, num_heads, mode):
    from synchformer_tpu.ops.pallas.divided_attention import (
        divided_attention_pallas_4d,
    )

    out = divided_attention_pallas_4d(qkv_patches, qkv_cls, num_heads, mode)
    return out, (qkv_patches, qkv_cls)


def _bwd_split(num_heads, mode, res, g):
    qkv_p, qkv_c = res
    gp, gc = g
    b, f, n, threed = qkv_p.shape
    d = threed // 3
    qkv = jnp.concatenate([qkv_c, qkv_p.reshape(b, f * n, threed)], axis=1)
    dout = jnp.concatenate([gc, gp.reshape(b, f * n, d)], axis=1)
    dqkv = _divided_attention_bwd_pallas(qkv, dout, num_heads, f, mode)
    return dqkv[:, 1:].reshape(b, f, n, threed), dqkv[:, :1]


divided_attention_split.defvjp(_fwd_split, _bwd_split)


def _fwd(qkv, num_heads, num_frames, mode):
    return divided_attention_pallas(qkv, num_heads, num_frames, mode), qkv


def _bwd(num_heads, num_frames, mode, qkv, g):
    return (_divided_attention_bwd_pallas(qkv, g, num_heads, num_frames, mode),)


divided_attention.defvjp(_fwd, _bwd)
