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

from synchformer_tpu.ops.pallas.divided_attention import (
    _NT,
    _PV3,
    _QK3,
    _lane_masks_v3,
    divided_attention_pallas,
)

_TQ3 = (((1,), (1,)), ((0,), (0,)))  # contract queries axis, batch frames
_T0 = (((0,), (0,)), ((), ()))       # contract rows axis (transpose-free outer)
_OUT3 = (((1,), (1,)), ((0,), (0,)))  # frame-batched outer: (f,1,n)x(f,1,w)->(f,n,w)


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


# ---------------------------------------------------------------------------
# 4D (split cls/patches) backward — lane-masked head pairs, aligned slabs
# ---------------------------------------------------------------------------
#
# Mirrors the 4D forward (divided_attention.py::_kernel_4d): one full-width
# contiguous block per program (grid over segments only), patches kept as
# (segs, f, n, 3D) so every in-kernel slice is sublane-aligned, heads
# processed in 128-lane PAIRS separated by lane masking. Removes the packed
# <-> split conversion copies the v1 backward path needed (~30 ms/step of
# pure relayouts in the Stage-I train step).
#
# Lane-masking in the backward: for head h with mask qm, the cotangent is
# masked on the DO side (do*qm) so dv/dp contractions only see head-h lanes;
# dq results are masked AFTER the ds@k matmul (k is unmasked, so the other
# head's lanes carry garbage that the mask kills); dk contracts against the
# already-masked q so it lands packed in head-h lanes by construction.


def _cls_row_bwd_4d(qc, kc, vc, kf, vf, doc, masks):
    """Backward of the 4D CLS row (cls query attends [cls; all patches]).

    qc is PRE-SCALED (1, w); kf/vf are (f, n, w); doc is the (1, w)
    cotangent. Returns f32 (dqc, dkc, dvc, dkf, dvf) where dqc is w.r.t. the
    PRE-SCALED query (caller applies the extra head-dim scale).

    All per-frame contractions run as frame-batched dot_generals (the single
    CLS query/cotangent broadcast over the frame axis) instead of 5f tiny
    dispatches — mirrors the forward `_cls_row_4d` batching, which measured
    ~0.65 ms/call of pure dispatch overhead in the unrolled form."""
    f, n, w = kf.shape
    dqc = jnp.zeros((1, w), jnp.float32)
    dkc = jnp.zeros((1, w), jnp.float32)
    dvc = jnp.zeros((1, w), jnp.float32)
    dkf = jnp.zeros((f, n, w), jnp.float32)
    dvf = jnp.zeros((f, n, w), jnp.float32)
    for qm in masks:
        qcm = qc * qm
        lc = jnp.sum((qcm * kc).astype(jnp.float32), axis=-1, keepdims=True)
        qb = jnp.broadcast_to(qcm[None], (f, 1, w)).astype(qc.dtype)
        lp = jax.lax.dot_general(qb, kf, _QK3,
                                 preferred_element_type=jnp.float32)  # (f,1,n)
        m = jnp.maximum(jnp.max(lp), lc[0, 0])
        ec = jnp.exp(lc - m)                             # (1, 1)
        ep = jnp.exp(lp - m)                             # (f, 1, n)
        denom = ec + jnp.sum(ep, dtype=jnp.float32)
        pc = ec / denom                                  # (1, 1)
        ps = ep / denom                                  # (f, 1, n)
        dom = (doc * qm).astype(jnp.float32)             # masked cotangent
        dom_b = dom.astype(doc.dtype)
        dob = jnp.broadcast_to(dom_b[None], (f, 1, w))
        dpc = jnp.sum(dom * vc.astype(jnp.float32), axis=-1, keepdims=True)
        dps = jax.lax.dot_general(dob, vf, _QK3,
                                  preferred_element_type=jnp.float32)  # (f,1,n)
        sigma = pc * dpc + jnp.sum(ps * dps, dtype=jnp.float32)
        dsc = pc * (dpc - sigma)                         # (1, 1)
        dsj = (ps * (dps - sigma)).astype(qc.dtype)      # (f, 1, n)
        dq_f = jax.lax.dot_general(dsj, kf, _PV3,
                                   preferred_element_type=jnp.float32)  # (f,1,w)
        dqc_m = dsc * kc.astype(jnp.float32) + jnp.sum(dq_f, axis=0)
        dkc = dkc + dsc * qcm.astype(jnp.float32)
        dvc = dvc + pc * dom
        # frame-batched outer products: contract the size-1 query axis
        dkf = dkf + jax.lax.dot_general(dsj, qb, _OUT3,
                                        preferred_element_type=jnp.float32)
        dvf = dvf + jax.lax.dot_general(ps.astype(doc.dtype), dob, _OUT3,
                                        preferred_element_type=jnp.float32)
        dqc = dqc + dqc_m * qm
    return dqc, dkc, dvc, dkf, dvf


def _space_bwd_pair_4d(qf, kf, vf, kc, vc, dof, masks, dtype):
    """Frame-batched space-attention backward with the CLS k/v folded in.

    qf is PRE-SCALED (f, n, w); kc/vc are (1, w); dof is the (f, n, w)
    cotangent. Returns f32 (dqf, dkf, dvf, dkc, dvc); dqf w.r.t. the
    pre-scaled query."""
    dqf = jnp.zeros(qf.shape, jnp.float32)
    dkf = jnp.zeros(qf.shape, jnp.float32)
    dvf = jnp.zeros(qf.shape, jnp.float32)
    dkc = jnp.zeros((1, qf.shape[-1]), jnp.float32)
    dvc = jnp.zeros((1, qf.shape[-1]), jnp.float32)
    for qm in masks:
        qfm = qf * qm[None]
        logits = jax.lax.dot_general(qfm, kf, _QK3,
                                     preferred_element_type=jnp.float32)
        cls_logit = jnp.sum(qfm * kc[None].astype(qf.dtype), axis=-1,
                            keepdims=True, dtype=jnp.float32)     # (f, n, 1)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
        ep = jnp.exp(logits - m)
        ec = jnp.exp(cls_logit - m)
        denom = jnp.sum(ep, axis=-1, keepdims=True) + ec
        p = ep / denom                                   # (f, n, n) f32
        pc = ec / denom                                  # (f, n, 1) f32
        dom_b = dof * qm[None].astype(dof.dtype)
        dom = dom_b.astype(jnp.float32)
        dvf = dvf + jax.lax.dot_general(p.astype(dtype), dom_b, _TQ3,
                                        preferred_element_type=jnp.float32)
        dvc = dvc + jnp.sum(pc * dom, axis=(0, 1))[None]
        dp = jax.lax.dot_general(dom_b, vf, _QK3,
                                 preferred_element_type=jnp.float32)
        dpc = jnp.sum(dom * vc[None].astype(jnp.float32), axis=-1,
                      keepdims=True)                      # (f, n, 1)
        sigma = jnp.sum(p * dp, axis=-1, keepdims=True) + pc * dpc
        ds = (p * (dp - sigma)).astype(dtype)
        dsc = pc * (dpc - sigma)                          # (f, n, 1) f32
        dqf = dqf + (jax.lax.dot_general(ds, kf, _PV3,
                                         preferred_element_type=jnp.float32)
                     + dsc * kc[None].astype(jnp.float32)) * qm[None]
        dkf = dkf + jax.lax.dot_general(ds, qfm, _TQ3,
                                        preferred_element_type=jnp.float32)
        dkc = dkc + jnp.sum(dsc * qfm.astype(jnp.float32), axis=(0, 1))[None]
    return dqf, dkf, dvf, dkc, dvc


def _time_bwd_pair_4d(qf, kf, vf, kc, vc, dof, masks, dtype, group: int = 16):
    """Per-position (time) attention backward via the same grouped masked MXU
    matmuls as the forward: 16 aligned positions -> one (f*16, f*16) logits
    tile with an iota grid mask. Shapes/returns as _space_bwd_pair_4d."""
    f, n, w = qf.shape
    neg = jnp.float32(-1e30)
    dkc = jnp.zeros((1, w), jnp.float32)
    dvc = jnp.zeros((1, w), jnp.float32)
    dq_groups, dk_groups, dv_groups = [], [], []
    gmasks = {}
    for g0 in range(0, n, group):
        gw = min(group, n - g0)
        rows_n = f * gw
        if gw not in gmasks:
            rr = jax.lax.broadcasted_iota(jnp.int32, (rows_n, rows_n), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (rows_n, rows_n), 1)
            gmasks[gw] = (rr % gw) == (cc % gw)
        qg = qf[:, g0:g0 + gw].reshape(rows_n, w)
        kg = kf[:, g0:g0 + gw].reshape(rows_n, w)
        vg = vf[:, g0:g0 + gw].reshape(rows_n, w)
        dog = dof[:, g0:g0 + gw].reshape(rows_n, w)
        dqg = jnp.zeros((rows_n, w), jnp.float32)
        dkg = jnp.zeros((rows_n, w), jnp.float32)
        dvg = jnp.zeros((rows_n, w), jnp.float32)
        for qm in masks:
            qgm = qg * qm
            logits = jax.lax.dot_general(qgm, kg, _NT,
                                         preferred_element_type=jnp.float32)
            logits = jnp.where(gmasks[gw], logits, neg)
            cls_logit = jnp.sum(qgm * kc, axis=-1, keepdims=True,
                                dtype=jnp.float32)        # (rows, 1)
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
            ep = jnp.exp(logits - m)
            ec = jnp.exp(cls_logit - m)
            denom = jnp.sum(ep, axis=-1, keepdims=True) + ec
            p = ep / denom      # masked entries underflow to exactly 0
            pc = ec / denom
            dom_b = dog * qm.astype(dog.dtype)
            dom = dom_b.astype(jnp.float32)
            dvg = dvg + jax.lax.dot_general(p.astype(dtype), dom_b, _T0,
                                            preferred_element_type=jnp.float32)
            dvc = dvc + jnp.sum(pc * dom, axis=0)[None]
            dp = jax.lax.dot_general(dom_b, vg, _NT,
                                     preferred_element_type=jnp.float32)
            dpc = jnp.sum(dom * vc.astype(jnp.float32), axis=-1, keepdims=True)
            sigma = jnp.sum(p * dp, axis=-1, keepdims=True) + pc * dpc
            ds = (p * (dp - sigma)).astype(dtype)         # 0 where masked
            dsc = pc * (dpc - sigma)                      # (rows, 1)
            dqg = dqg + (jnp.dot(ds, kg, preferred_element_type=jnp.float32)
                         + dsc * kc.astype(jnp.float32)) * qm
            dkg = dkg + jax.lax.dot_general(ds, qgm, _T0,
                                            preferred_element_type=jnp.float32)
            dkc = dkc + jnp.sum(dsc * qgm.astype(jnp.float32), axis=0)[None]
        dq_groups.append(dqg.reshape(f, gw, w))
        dk_groups.append(dkg.reshape(f, gw, w))
        dv_groups.append(dvg.reshape(f, gw, w))
    return (jnp.concatenate(dq_groups, axis=1),
            jnp.concatenate(dk_groups, axis=1),
            jnp.concatenate(dv_groups, axis=1), dkc, dvc)


def _bwd_kernel_4d(xp_ref, xc_ref, dop_ref, doc_ref, dxp_ref, dxc_ref, *,
                   mode: str, head_dim: int, width: int, segs: int, d: int):
    n_pairs = d // width
    w = width
    scale = jnp.asarray(head_dim ** -0.5, xp_ref.dtype)
    scale32 = jnp.float32(head_dim ** -0.5)
    masks = _lane_masks_v3(w, head_dim, xp_ref.dtype)
    for s in range(segs):
        for p in range(n_pairs):
            qf = xp_ref[s, :, :, p * w:(p + 1) * w] * scale
            kf = xp_ref[s, :, :, d + p * w:d + (p + 1) * w]
            vf = xp_ref[s, :, :, 2 * d + p * w:2 * d + (p + 1) * w]
            qc = xc_ref[s, :, p * w:(p + 1) * w] * scale
            kc = xc_ref[s, :, d + p * w:d + (p + 1) * w]
            vc = xc_ref[s, :, 2 * d + p * w:2 * d + (p + 1) * w]
            dop = dop_ref[s, :, :, p * w:(p + 1) * w]
            doc = doc_ref[s, :, p * w:(p + 1) * w]

            dqc, dkc_c, dvc_c, dkf_c, dvf_c = _cls_row_bwd_4d(
                qc, kc, vc, kf, vf, doc, masks)
            if mode == "space":
                dqf, dkf_p, dvf_p, dkc_p, dvc_p = _space_bwd_pair_4d(
                    qf, kf, vf, kc, vc, dop, masks, xp_ref.dtype)
            else:
                dqf, dkf_p, dvf_p, dkc_p, dvc_p = _time_bwd_pair_4d(
                    qf, kf, vf, kc, vc, dop, masks, xp_ref.dtype)

            dxp_ref[s, :, :, p * w:(p + 1) * w] = (
                dqf * scale32).astype(dxp_ref.dtype)
            dxp_ref[s, :, :, d + p * w:d + (p + 1) * w] = (
                dkf_c + dkf_p).astype(dxp_ref.dtype)
            dxp_ref[s, :, :, 2 * d + p * w:2 * d + (p + 1) * w] = (
                dvf_c + dvf_p).astype(dxp_ref.dtype)
            dxc_ref[s, :, p * w:(p + 1) * w] = (
                dqc * scale32).astype(dxc_ref.dtype)
            dxc_ref[s, :, d + p * w:d + (p + 1) * w] = (
                dkc_c + dkc_p).astype(dxc_ref.dtype)
            dxc_ref[s, :, 2 * d + p * w:2 * d + (p + 1) * w] = (
                dvc_c + dvc_p).astype(dxc_ref.dtype)


def _divided_attention_bwd_4d(qkv_p, qkv_c, dop, doc, num_heads: int,
                              mode: str, segs_per_block: int = 1):
    """Split-layout backward: (d qkv_patches (B, f, n, 3D), d qkv_cls
    (B, 1, 3D)) from cotangents (dop (B, f, n, D), doc (B, 1, D))."""
    b, f, n, threed = qkv_p.shape
    d = threed // 3
    dh = d // num_heads
    hpg = max(1, 128 // dh)
    width = hpg * dh
    assert num_heads % hpg == 0 and width % 128 == 0, "use the packed bwd"
    while segs_per_block > 1 and b % segs_per_block != 0:
        segs_per_block //= 2
    kernel = functools.partial(_bwd_kernel_4d, mode=mode, head_dim=dh,
                               width=width, segs=segs_per_block, d=d)

    def spec4(cols):
        return pl.BlockSpec((segs_per_block, f, n, cols),
                            lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM)

    def spec3(cols):
        return pl.BlockSpec((segs_per_block, 1, cols),
                            lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b // segs_per_block,),
        in_specs=[spec4(threed), spec3(threed), spec4(d), spec3(d)],
        out_specs=(spec4(threed), spec3(threed)),
        out_shape=(jax.ShapeDtypeStruct((b, f, n, threed), qkv_p.dtype),
                   jax.ShapeDtypeStruct((b, 1, threed), qkv_c.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
    )(qkv_p, qkv_c, dop, doc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _divided_attention_vjp(qkv, num_heads: int, num_frames: int, mode: str):
    return divided_attention_pallas(qkv, num_heads, num_frames, mode)


def divided_attention(qkv, num_heads: int, num_frames: int, mode: str):
    """Differentiable fused divided attention: pallas forward AND backward.
    Under an active data mesh the kernel runs per data shard via shard_map
    (pallas custom calls have no SPMD partitioning rule — see
    parallel/mesh.py::data_sharded_kernel)."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    return data_sharded_kernel(
        lambda q: _divided_attention_vjp(q, num_heads, num_frames, mode),
        batched=(0,))(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _divided_attention_split_vjp(qkv_patches, qkv_cls, num_heads: int, mode: str):
    from synchformer_tpu.ops.pallas.divided_attention import (
        divided_attention_pallas_4d,
    )

    return divided_attention_pallas_4d(qkv_patches, qkv_cls, num_heads, mode)


def divided_attention_split(qkv_patches, qkv_cls, num_heads: int, mode: str):
    """Differentiable split-layout divided attention (the fastest forward):
    qkv_patches (B, f, n, 3D) + qkv_cls (B, 1, 3D) -> (patches (B, f, n, D),
    cls (B, 1, D)). Backward runs the 4D split-layout kernels directly when
    the head layout is 128-lane aligned (no packed-layout conversion copies);
    otherwise it converts to the packed layout and reuses the v1 kernels.
    Runs per data shard under an active data mesh (see divided_attention)."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    return data_sharded_kernel(
        lambda qp, qc: _divided_attention_split_vjp(qp, qc, num_heads, mode),
        batched=(0, 1), n_out=2)(qkv_patches, qkv_cls)


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
    dh = d // num_heads
    hpg = max(1, 128 // dh)
    if num_heads % hpg == 0 and (hpg * dh) % 128 == 0:
        return _divided_attention_bwd_4d(qkv_p, qkv_c, gp, gc, num_heads, mode)
    qkv = jnp.concatenate([qkv_c, qkv_p.reshape(b, f * n, threed)], axis=1)
    dout = jnp.concatenate([gc, gp.reshape(b, f * n, d)], axis=1)
    dqkv = _divided_attention_bwd_pallas(qkv, dout, num_heads, f, mode)
    return dqkv[:, 1:].reshape(b, f, n, threed), dqkv[:, :1]


_divided_attention_split_vjp.defvjp(_fwd_split, _bwd_split)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _divided_attention_proj_split_vjp(qkv_patches, qkv_cls, res_patches,
                                      res_cls, wo, bo, num_heads: int,
                                      mode: str):
    from synchformer_tpu.ops.pallas.divided_attention import (
        divided_attention_proj_4d,
    )

    yp, attn_c = divided_attention_proj_4d(qkv_patches, qkv_cls, res_patches,
                                           wo, bo, num_heads, mode)
    yc = res_cls + (jnp.dot(attn_c, wo.astype(attn_c.dtype),
                            preferred_element_type=jnp.float32)
                    + bo).astype(res_cls.dtype)
    return yp, yc


def divided_attention_proj_split(qkv_patches, qkv_cls, res_patches, res_cls,
                                 wo, bo, num_heads: int, mode: str):
    """Split-layout divided attention with the output projection + residual
    fused into the forward kernel (ops/pallas/divided_attention.py::
    divided_attention_proj_4d): returns (y_patches, y_cls) = res + proj(attn).

    The raw (B, f, n, D) attention output never round-trips to HBM — vs the
    XLA epilogue this saves one write + two reads of it per layer-call.
    Backward composes the existing 4D attention backward kernels with the
    projection's matmul grads (the attention forward is recomputed for dWo —
    cheaper than saving the output, and the fused path is deterministic-only
    so gradients only flow through it in tests). Runs per data shard under an
    active data mesh (see divided_attention)."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    return data_sharded_kernel(
        lambda qp, qc, rp, rc, w, b: _divided_attention_proj_split_vjp(
            qp, qc, rp, rc, w, b, num_heads, mode),
        batched=(0, 1, 2, 3), replicated=(4, 5), n_out=2)(
        qkv_patches, qkv_cls, res_patches, res_cls, wo, bo)


def _fwd_proj_split(qkv_p, qkv_c, res_p, res_c, wo, bo, num_heads, mode):
    out = _divided_attention_proj_split_vjp(qkv_p, qkv_c, res_p, res_c,
                                            wo, bo, num_heads, mode)
    return out, (qkv_p, qkv_c, wo)


def _bwd_proj_split(num_heads, mode, res, g):
    from synchformer_tpu.ops.pallas.divided_attention import (
        divided_attention_pallas_4d,
    )

    qkv_p, qkv_c, wo = res
    gp, gc = g
    d = wo.shape[0]
    # proj grads: dA = g @ Wo^T; dWo = A^T @ g (A recomputed); dbo = sum g
    wot = wo.astype(gp.dtype)
    da_p = jax.lax.dot_general(gp, wot, (((3,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(gp.dtype)
    da_c = jax.lax.dot_general(gc, wot, (((2,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(gc.dtype)
    a_p, a_c = divided_attention_pallas_4d(qkv_p, qkv_c, num_heads, mode)
    dwo = (jnp.dot(a_p.reshape(-1, d).T, gp.reshape(-1, d),
                   preferred_element_type=jnp.float32)
           + jnp.dot(a_c.reshape(-1, d).T, gc.reshape(-1, d),
                     preferred_element_type=jnp.float32)).astype(wo.dtype)
    dbo = (jnp.sum(gp.astype(jnp.float32), axis=(0, 1, 2))
           + jnp.sum(gc.astype(jnp.float32), axis=(0, 1)))
    dqkv_p, dqkv_c = _bwd_split(num_heads, mode, (qkv_p, qkv_c), (da_p, da_c))
    return dqkv_p, dqkv_c, gp, gc, dwo, dbo


_divided_attention_proj_split_vjp.defvjp(_fwd_proj_split, _bwd_proj_split)


def _fwd(qkv, num_heads, num_frames, mode):
    return divided_attention_pallas(qkv, num_heads, num_frames, mode), qkv


def _bwd(num_heads, num_frames, mode, qkv, g):
    return (_divided_attention_bwd_pallas(qkv, g, num_heads, num_frames, mode),)


_divided_attention_vjp.defvjp(_fwd, _bwd)
