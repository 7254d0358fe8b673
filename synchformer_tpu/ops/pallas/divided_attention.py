"""Fused Pallas kernel for divided space-time attention (Motionformer).

Why: the XLA lowering of divided attention materializes (B*S, 12, 8, 196, 197)
fp32 logit tensors in HBM (~1.7 GB per layer at B=8) and spends ~38% of the
tower's wall-clock on pure layout copies of the head-split QKV (measured with
the JAX profiler on a v5e chip; see git history). This kernel:

- reads q/k/v straight out of the packed (N, 3D) QKV matmul output via three
  column-sliced BlockSpecs — NO head-split transpose ever hits HBM
- runs the whole group attention (CLS row + per-frame / per-position groups,
  with the CLS key/value folded into every group's softmax as an extra term —
  Mosaic cannot concatenate on non-lane dims) inside VMEM: logits/softmax stay
  on-chip in fp32; matmuls run in bf16 on the MXU with fp32 accumulation
- grid (B*S / SEGS, H / heads_per_block): each program covers SEGS segments
  and 2 heads, so VPU tiles are (SEGS*196, 64) and op-dispatch overhead is
  amortized (the time mode is dispatch-bound: measured 33 -> 17 ms/layer-call
  going from 1 to 4 segments per program)
- time mode uses a streaming (flash-style) softmax over the f+1 candidate
  keys: one (SEGS, n, dh) elementwise multiply + lane-reduce per key frame —
  no transposes, no 4D broadcasts, no giant intermediates

Semantics identical to models/motionformer.py::DividedAttention (verified by
tests against the XLA path, which remains the fallback / training-autodiff
path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cls_row(q, k, v, o_ref, s: int, col0: int):
    """CLS query of segment s attends to all tokens (bf16 MXU, fp32 softmax)."""
    dh = q.shape[-1]
    logits = jnp.dot(q[0:1], k.T, preferred_element_type=jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    o_ref[s, 0:1, col0:col0 + dh] = jnp.dot(
        probs, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _space_segment(q, k, v, o_ref, s: int, col0: int, f: int, n: int):
    """One (segment, head): CLS row + per-frame attention, CLS key folded in.

    The f per-frame attentions run as ONE batched dot_general over the frame
    axis (an unrolled python loop of f small (n, dh) matmuls is
    dispatch-bound on the MXU)."""
    dh = q.shape[-1]
    _cls_row(q, k, v, o_ref, s, col0)
    k0 = k[0:1]
    v0 = v[0:1].astype(jnp.float32)
    qf = q[1:].reshape(f, n, dh)
    kf = k[1:].reshape(f, n, dh)
    vf = v[1:].reshape(f, n, dh)
    batched = (((2,), (2,)), ((0,), (0,)))  # contract dh, batch over frames
    logits = jax.lax.dot_general(qf, kf, batched,
                                 preferred_element_type=jnp.float32)  # (f, n, n)
    cls_logit = jnp.sum(qf * k0[None].astype(qf.dtype), axis=-1,
                        keepdims=True, dtype=jnp.float32)             # (f, n, 1)
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
    ep = jnp.exp(logits - m)
    ec = jnp.exp(cls_logit - m)
    denom = jnp.sum(ep, axis=-1, keepdims=True) + ec
    pv = (((2,), (1,)), ((0,), (0,)))  # contract keys axis, batch over frames
    out = (jax.lax.dot_general(ep.astype(q.dtype), vf, pv,
                               preferred_element_type=jnp.float32)
           + ec * v0[None]) / denom                                   # (f, n, dh)
    o_ref[s, 1:, col0:col0 + dh] = out.reshape(f * n, dh).astype(o_ref.dtype)


def _time_block_mxu(q, k, v, o_ref, col0: int, f: int, n: int, segs: int,
                    group: int = 16):
    """Time attention as masked 128-row MXU matmuls.

    The f-frame groups that attend to each other share a spatial position p;
    only f=8 tokens per group makes per-group matmuls dispatch-bound and the
    elementwise (streaming) formulation VPU-bound. Instead, GROUP tokens of
    ``group`` adjacent positions into one (f*group, dh) tile (frame-major row
    order j*group+pl — taken directly with f static slices, NO transpose) and
    run ONE (f*group, f*group) logits matmul per tile on the MXU, masking
    cross-position entries with an iota grid mask (row%group == col%group).
    The CLS key/value fold in as one extra softmax term, as everywhere else.

    FLOP inflation vs the ideal block-diagonal is `group`x, but the MXU is
    ~50-100x faster than the VPU at this shape, so it wins decisively
    (measured ~3x vs the streaming formulation on v5e)."""
    dh = q.shape[-1]
    for s in range(segs):
        _cls_row(q[s], k[s], v[s], o_ref, s, col0)
    neg = jnp.float32(-1e30)

    def grid_mask(rows_n: int, gw: int):
        rr = jax.lax.broadcasted_iota(jnp.int32, (rows_n, rows_n), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (rows_n, rows_n), 1)
        return (rr % gw) == (cc % gw)

    masks = {}
    for s in range(segs):
        k0 = k[s, 0:1]
        v0 = v[s, 0:1].astype(jnp.float32)
        for g0 in range(0, n, group):
            gw = min(group, n - g0)
            if gw not in masks:
                masks[gw] = grid_mask(f * gw, gw)
            qg = jnp.concatenate(
                [q[s, 1 + j * n + g0:1 + j * n + g0 + gw] for j in range(f)], 0)
            kg = jnp.concatenate(
                [k[s, 1 + j * n + g0:1 + j * n + g0 + gw] for j in range(f)], 0)
            vg = jnp.concatenate(
                [v[s, 1 + j * n + g0:1 + j * n + g0 + gw] for j in range(f)], 0)
            logits = jnp.dot(qg, kg.T, preferred_element_type=jnp.float32)
            logits = jnp.where(masks[gw], logits, neg)
            cls_logit = jnp.sum(qg * k0, axis=-1, keepdims=True,
                                dtype=jnp.float32)               # (f*gw, 1)
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
            ep = jnp.exp(logits - m)
            ec = jnp.exp(cls_logit - m)
            denom = jnp.sum(ep, axis=-1, keepdims=True) + ec
            out = (jnp.dot(ep.astype(q.dtype), vg,
                           preferred_element_type=jnp.float32)
                   + ec * v0) / denom                            # (f*gw, dh)
            for j in range(f):
                o_ref[s, 1 + j * n + g0:1 + j * n + g0 + gw, col0:col0 + dh] = (
                    out[j * gw:(j + 1) * gw].astype(o_ref.dtype))


def _time_block(q, k, v, o_ref, col0: int, f: int, n: int, segs: int):
    """SEGS segments of one head: CLS rows + TWO-PASS per-position attention
    across frames on (SEGS, n, dh) tiles.

    All f+1 candidate logits are (segs, n, 1) and fit VMEM trivially, so the
    softmax needs no online (flash-style) running corrections: pass 1
    computes every logit, pass 2 does one max/exp/denominator and a single
    weighted accumulation of the values. Dropping the per-key-frame
    ``acc * corr`` rescans of the (segs, n, dh) accumulator removes ~45% of
    the VPU work vs the round-1 streaming formulation."""
    dh = q.shape[-1]
    for s in range(segs):
        _cls_row(q[s], k[s], v[s], o_ref, s, col0)

    k0 = jnp.broadcast_to(k[:, 0:1], (segs, n, dh))
    v0 = jnp.broadcast_to(v[:, 0:1], (segs, n, dh))
    for cq in range(f):  # query frame
        row0 = 1 + cq * n
        qp = q[:, row0:row0 + n]  # (segs, n, dh)
        # pass 1: all f+1 logits (bf16 products, f32 reduce)
        logits = [jnp.sum(qp * k0, axis=-1, keepdims=True, dtype=jnp.float32)]
        for j in range(f):
            logits.append(jnp.sum(qp * k[:, 1 + j * n:1 + (j + 1) * n],
                                  axis=-1, keepdims=True, dtype=jnp.float32))
        m = logits[0]
        for l in logits[1:]:
            m = jnp.maximum(m, l)
        # pass 2: single softmax + one weighted value accumulation
        exps = [jnp.exp(l - m) for l in logits]
        denom = exps[0]
        for e in exps[1:]:
            denom = denom + e
        acc = (exps[0].astype(v.dtype) * v0).astype(jnp.float32)
        for j in range(f):
            contrib = exps[j + 1].astype(v.dtype) * v[:, 1 + j * n:1 + (j + 1) * n]
            acc = acc + contrib.astype(jnp.float32)
        o_ref[:, row0:row0 + n, col0:col0 + dh] = (acc / denom).astype(o_ref.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, mode: str, num_frames: int,
            n_tokens: int, heads_per_block: int, head_dim: int, segs: int):
    scale = jnp.asarray(head_dim ** -0.5, q_ref.dtype)
    for hp in range(heads_per_block):
        c0 = hp * head_dim
        q = q_ref[:, :, c0:c0 + head_dim] * scale  # (segs, seq, dh)
        k = k_ref[:, :, c0:c0 + head_dim]
        v = v_ref[:, :, c0:c0 + head_dim]
        if mode == "space":
            for s in range(segs):
                _space_segment(q[s], k[s], v[s], o_ref, s, c0,
                               num_frames, n_tokens)
        else:
            _time_block_mxu(q, k, v, o_ref, c0, num_frames, n_tokens, segs)


# ---------------------------------------------------------------------------
# v3: full-width contiguous blocks + lane-masked head pairs
# ---------------------------------------------------------------------------
#
# Ablating the v1 kernels on a v5e (space mode, B*S=112: base 15.2 ms,
# no-softmax 11.8, no-matmuls 9.5, no-cls-row 12.7) showed the cost is NOT
# the attention math but data movement: the column-sliced BlockSpecs are
# strided 256-byte-chunk DMAs, every per-head 64-lane slice relayouts its
# operand, and the CLS row's explicit k.T materializes a transpose. v3:
#
# - ONE full-width block (segs, seq, 3D) per program: perfectly contiguous
#   DMA (the grid covers only segments).
# - heads are processed in PAIRS: in the packed [q|k|v] layout with D=768,
#   every pair slice q[:, 128p:128p+128], k[:, 768+128p:...], v[...] starts
#   at a lane multiple of 128 — no relayouts, NO column permutation needed.
#   Inside a pair the two heads are separated by LANE MASKING: the logits
#   matmul contracts all 128 lanes with the other head's lanes zeroed on
#   the Q side (zeros kill the cross terms), and the PV matmul zeroes the
#   V side so both heads' outputs land packed in their own 64-lane halves
#   of one (rows, 128) result — which IS the standard head-major output
#   order, so the out-projection consumes it unchanged.
# - no jnp.dot(..., k.T): all contractions are dot_generals on the minor
#   dim, so Mosaic never materializes a transposed copy.
# - time mode reuses the space mode's one-per-segment (f, n, W) reshape and
#   slices ALIGNED 16-position groups out of it (16 % 8 == 0), instead of
#   gathering 8 misaligned 16-row strips per group.


def _lane_masks_v3(width: int, head_dim: int, dtype):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    return [(lanes // head_dim == i).astype(dtype)
            for i in range(width // head_dim)]


_NT = (((1,), (1,)), ((), ()))          # (a, K) x (b, K) -> (a, b)
_QK3 = (((2,), (2,)), ((0,), (0,)))     # batch dim 0, contract minor
_PV3 = (((2,), (1,)), ((0,), (0,)))     # batch dim 0, contract rhs rows


def _cls_row_v3(q, k, v, masks):
    """CLS query (1, W) over all keys (seq, W), lane-masked heads, no
    transposes. Returns (1, W) packed output."""
    out = jnp.zeros((1, q.shape[-1]), jnp.float32)
    for qm in masks:
        logits = jax.lax.dot_general(q * qm, k, _NT,
                                     preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        out = out + jnp.dot(probs, v * qm.astype(v.dtype),
                            preferred_element_type=jnp.float32)
    return out


def _space_pair_v3(qf, kf, vf, k0, v0, masks, dtype):
    """(f, n, W) frame-batched space attention with the CLS k/v folded in.
    Returns (f, n, W) packed f32.

    VPU-traffic-minimal softmax (round-3 ablation: exp itself is FREE on the
    VPU — a noexp variant measured +0.08 ms — the 1.3 ms/layer softmax cost
    is the VMEM passes over the (f, n, n) f32 logits). Two passes survive:
    the row-max read and one fused sub→exp→convert read/write that emits the
    probabilities directly in the matmul dtype. The denominator moves to the
    MXU: this mask's PV output lanes for the OTHER head are dead zeros (vf is
    lane-masked), so planting a ones-lane there makes the PV matmul deliver
    row sums of ep for free — no separate f32 ep materialization, no VPU
    lane-reduce over the logits, no standalone convert pass."""
    out = jnp.zeros(qf.shape, jnp.float32)
    w = qf.shape[-1]
    n_masks = len(masks)
    dh = w // n_masks
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    for i, qm in enumerate(masks):
        qfm = qf * qm[None]
        logits = jax.lax.dot_general(qfm, kf, _QK3,
                                     preferred_element_type=jnp.float32)
        cls_logit = jnp.sum(qfm * k0[None].astype(qf.dtype), axis=-1,
                            keepdims=True, dtype=jnp.float32)       # (f, n, 1)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
        ep = jnp.exp(logits - m).astype(dtype)
        ec = jnp.exp(cls_logit - m)
        v0m = (v0 * qm.astype(v0.dtype))[None].astype(jnp.float32)
        if n_masks > 1:
            j0 = ((i + 1) % n_masks) * dh   # a dead lane under this mask
            onehot = (lanes == j0).astype(vf.dtype)
            vfm = vf * qm[None].astype(vf.dtype) + onehot[None]
            pv = jax.lax.dot_general(ep, vfm, _PV3,
                                     preferred_element_type=jnp.float32)
            denom = pv[:, :, j0:j0 + 1] + ec
            out = out + (pv + ec * v0m) * qm[None].astype(jnp.float32) / denom
        else:  # full-width single head: no dead lane to carry the row sum
            vfm = vf * qm[None].astype(vf.dtype)
            denom = jnp.sum(ep, axis=-1, keepdims=True,
                            dtype=jnp.float32) + ec
            pv = jax.lax.dot_general(ep, vfm, _PV3,
                                     preferred_element_type=jnp.float32)
            out = out + (pv + ec * v0m) / denom
    return out


def _time_pair_v3(qf, kf, vf, k0, v0, masks, dtype, group: int = 16,
                  store=None):
    """(f, n, W) -> (f, n, W) per-position attention via grouped masked MXU
    matmuls over ALIGNED 16-position slices of the frame-major reshape.

    With ``store`` (a callback (g0, gw, out_f32) -> None), each group's
    output is written straight to the destination ref instead of
    concatenated — drops the (f, n, W) f32 concat materialization + re-read
    (the round-3 ablations showed time mode is bound by in-kernel data
    movement, not math: removing the entire softmax moved it only 0.05 ms)."""
    f, n, w = qf.shape
    neg = jnp.float32(-1e30)
    gmasks = {}
    outs = []
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
        out = jnp.zeros((rows_n, w), jnp.float32)
        for qm in masks:
            qgm = qg * qm
            logits = jax.lax.dot_general(qgm, kg, _NT,
                                         preferred_element_type=jnp.float32)
            logits = jnp.where(gmasks[gw], logits, neg)
            cls_logit = jnp.sum(qgm * k0, axis=-1, keepdims=True,
                                dtype=jnp.float32)
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
            ep = jnp.exp(logits - m)
            ec = jnp.exp(cls_logit - m)
            denom = jnp.sum(ep, axis=-1, keepdims=True) + ec
            vgm = vg * qm.astype(vg.dtype)
            v0m = (v0 * qm.astype(v0.dtype)).astype(jnp.float32)
            out = out + (jnp.dot(ep.astype(dtype), vgm,
                                 preferred_element_type=jnp.float32)
                         + ec * v0m) / denom
        if store is not None:
            store(g0, gw, out.reshape(f, gw, w))
        else:
            outs.append(out.reshape(f, gw, w))
    return None if store is not None else jnp.concatenate(outs, axis=1)


def _kernel_v3(x_ref, o_ref, *, mode: str, num_frames: int, n_tokens: int,
               head_dim: int, width: int, segs: int, d: int):
    f, n, w = num_frames, n_tokens, width
    n_pairs = d // w
    scale = jnp.asarray(head_dim ** -0.5, x_ref.dtype)
    masks = _lane_masks_v3(w, head_dim, x_ref.dtype)
    for s in range(segs):
        for p in range(n_pairs):
            q = x_ref[s, :, p * w:(p + 1) * w] * scale
            k = x_ref[s, :, d + p * w:d + (p + 1) * w]
            v = x_ref[s, :, 2 * d + p * w:2 * d + (p + 1) * w]
            o_ref[s, 0:1, p * w:(p + 1) * w] = _cls_row_v3(
                q[0:1], k, v, masks).astype(o_ref.dtype)
            qf = q[1:].reshape(f, n, w)
            kf = k[1:].reshape(f, n, w)
            vf = v[1:].reshape(f, n, w)
            if mode == "space":
                out = _space_pair_v3(qf, kf, vf, k[0:1], v[0:1], masks,
                                     x_ref.dtype)
            else:
                out = _time_pair_v3(qf, kf, vf, k[0:1], v[0:1], masks,
                                    x_ref.dtype)
            o_ref[s, 1:, p * w:(p + 1) * w] = out.reshape(
                f * n, w).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# 4D (split cls/patches) layout — the fastest path
# ---------------------------------------------------------------------------
#
# The remaining v3 floor is the in-kernel [1:].reshape(f, n, W): with
# n = 196 not a multiple of 8, every frame slab relayouts on the VPU. When
# the caller keeps patches as (B, f, n, 3D) (the tower drops the CLS token
# at the end anyway, so the whole block stack can carry (cls, patches)
# split), the DMA engine pads each n-slab to sublane boundaries for free
# and every in-kernel slice is aligned: space 12.1 -> 8.4 ms, time
# 10.8 -> 8.1 ms per layer-call at B*S=112 on v5e.


def _cls_row_4d(qc, kc, vc, kf, vf, masks):
    """CLS query over [cls; all patches]. qc/kc/vc: (1, W); kf/vf: (f, n, W).
    Returns (1, W) packed f32.

    The per-frame logits/PV matmuls run as TWO frame-batched dot_generals
    (broadcast the single CLS query over the frame axis) instead of 2f tiny
    (1, n) dispatches — the CLS row was ~0.65 ms of the 3.4 ms time-mode
    kernel in the unrolled form (ablation in git history)."""
    f, n, w = kf.shape
    out = jnp.zeros((1, w), jnp.float32)
    for qm in masks:
        qcm = qc * qm
        lc = jnp.sum(qcm * kc, axis=-1, keepdims=True, dtype=jnp.float32)
        qb = jnp.broadcast_to(qcm[None], (f, 1, w)).astype(qc.dtype)
        lp = jax.lax.dot_general(qb, kf, _QK3,
                                 preferred_element_type=jnp.float32)  # (f,1,n)
        m = jnp.maximum(jnp.max(lp), lc[0, 0])
        ec = jnp.exp(lc - m)
        ep = jnp.exp(lp - m)
        denom = ec + jnp.sum(ep, dtype=jnp.float32)
        vm = qm.astype(vf.dtype)
        pv = jax.lax.dot_general(ep.astype(qc.dtype), vf * vm[None], _PV3,
                                 preferred_element_type=jnp.float32)  # (f,1,w)
        acc = ec * (vc * qm.astype(vc.dtype)).astype(jnp.float32) \
            + jnp.sum(pv, axis=0)
        out = out + acc / denom
    return out


def _kernel_4d(xp_ref, xc_ref, op_ref, oc_ref, *, mode: str, head_dim: int,
               width: int, segs: int, d: int):
    n_pairs = d // width
    scale = jnp.asarray(head_dim ** -0.5, xp_ref.dtype)
    masks = _lane_masks_v3(width, head_dim, xp_ref.dtype)
    w = width
    for s in range(segs):
        for p in range(n_pairs):
            qf = xp_ref[s, :, :, p * w:(p + 1) * w] * scale
            kf = xp_ref[s, :, :, d + p * w:d + (p + 1) * w]
            vf = xp_ref[s, :, :, 2 * d + p * w:2 * d + (p + 1) * w]
            qc = xc_ref[s, :, p * w:(p + 1) * w] * scale
            kc = xc_ref[s, :, d + p * w:d + (p + 1) * w]
            vc = xc_ref[s, :, 2 * d + p * w:2 * d + (p + 1) * w]
            oc_ref[s, :, p * w:(p + 1) * w] = _cls_row_4d(
                qc, kc, vc, kf, vf, masks).astype(oc_ref.dtype)
            if mode == "space":
                out = _space_pair_v3(qf, kf, vf, kc, vc, masks, xp_ref.dtype)
                op_ref[s, :, :, p * w:(p + 1) * w] = out.astype(op_ref.dtype)
            else:
                def store(g0, gw, out, s=s, p=p):
                    op_ref[s, :, g0:g0 + gw, p * w:(p + 1) * w] = (
                        out.astype(op_ref.dtype))
                _time_pair_v3(qf, kf, vf, kc, vc, masks, xp_ref.dtype,
                              store=store)


_PROJ3 = (((2,), (0,)), ((), ()))       # (f, n, K) @ (K, d) -> (f, n, d)


def _kernel_4d_proj(xp_ref, xc_ref, xr_ref, w_ref, b_ref, op_ref, oc_ref,
                    attn_ref, *, mode: str, head_dim: int, width: int,
                    segs: int, d: int):
    """4D kernel body + fused output-projection/residual epilogue.

    Identical attention math to ``_kernel_4d``; the per-pair outputs land in
    a bf16 VMEM scratch instead of HBM, then ONE frame-batched (f, n, D) @
    (D, D) projection matmul + residual add emits the block output — the raw
    attention output never round-trips to HBM (saves one write + two reads
    of (B, f, n, D) per layer-call vs the XLA-fused epilogue). An earlier
    variant projected each pair's (f, n, 128) slice immediately and
    accumulated in an f32 scratch: the 6x read-modify-write of the (f, n, D)
    f32 accumulator (~57 MB VMEM traffic/program) measured 13.0 vs 9.0 ms
    for the unfused composition — one K=768 matmul at the end replaces it.
    The CLS row (B, 1, D) stays raw; its projection is cheaper in XLA
    outside."""
    n_pairs = d // width
    scale = jnp.asarray(head_dim ** -0.5, xp_ref.dtype)
    masks = _lane_masks_v3(width, head_dim, xp_ref.dtype)
    w = width
    for s in range(segs):
        for p in range(n_pairs):
            qf = xp_ref[s, :, :, p * w:(p + 1) * w] * scale
            kf = xp_ref[s, :, :, d + p * w:d + (p + 1) * w]
            vf = xp_ref[s, :, :, 2 * d + p * w:2 * d + (p + 1) * w]
            qc = xc_ref[s, :, p * w:(p + 1) * w] * scale
            kc = xc_ref[s, :, d + p * w:d + (p + 1) * w]
            vc = xc_ref[s, :, 2 * d + p * w:2 * d + (p + 1) * w]
            oc_ref[s, :, p * w:(p + 1) * w] = _cls_row_4d(
                qc, kc, vc, kf, vf, masks).astype(oc_ref.dtype)
            if mode == "space":
                out = _space_pair_v3(qf, kf, vf, kc, vc, masks, xp_ref.dtype)
                attn_ref[:, :, p * w:(p + 1) * w] = out.astype(attn_ref.dtype)
            else:
                def store(g0, gw, out, p=p):
                    attn_ref[:, g0:g0 + gw, p * w:(p + 1) * w] = (
                        out.astype(attn_ref.dtype))
                _time_pair_v3(qf, kf, vf, kc, vc, masks, xp_ref.dtype,
                              store=store)
        y = jax.lax.dot_general(attn_ref[...], w_ref[...], _PROJ3,
                                preferred_element_type=jnp.float32)
        op_ref[s] = xr_ref[s] + (
            y + b_ref[0].astype(jnp.float32)).astype(op_ref.dtype)


def divided_attention_proj_4d(qkv_patches: jnp.ndarray, qkv_cls: jnp.ndarray,
                              res_patches: jnp.ndarray, wo: jnp.ndarray,
                              bo: jnp.ndarray, num_heads: int, mode: str):
    """Split-layout divided attention with the output projection + residual
    fused into the kernel epilogue (patch tokens only).

    Returns (patches_y (B, f, n, D) = res + proj(attn), cls_attn (B, 1, D)
    RAW attention output — project + add the CLS residual outside).
    Numerics: one K=D projection matmul on the bf16 attention output with
    f32 accumulation + f32 bias, rounded once to the residual dtype for the
    add — matches the module path (nn.Dense in bf16) to <=1 ulp."""
    b, f, n, threed = qkv_patches.shape
    d = threed // 3
    dh = d // num_heads
    hpg = max(1, 128 // dh)
    width = hpg * dh
    assert num_heads % hpg == 0 and width % 128 == 0, "use the packed kernel"
    kernel = functools.partial(_kernel_4d_proj, mode=mode, head_dim=dh,
                               width=width, segs=1, d=d)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, f, n, threed), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, threed), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, f, n, d), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, d), lambda bi: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda bi: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, f, n, d), lambda bi: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, d), lambda bi: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, f, n, d), res_patches.dtype),
                   jax.ShapeDtypeStruct((b, 1, d), qkv_patches.dtype)),
        scratch_shapes=[pltpu.VMEM((f, n, d), qkv_patches.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv_patches, qkv_cls, res_patches, wo.astype(qkv_patches.dtype),
      bo.reshape(1, d))


def divided_attention_pallas_4d(qkv_patches: jnp.ndarray, qkv_cls: jnp.ndarray,
                                num_heads: int, mode: str,
                                segs_per_block: int = 1):
    """Split-layout divided attention. qkv_patches: (B, f, n, 3D) frame-major
    patch tokens; qkv_cls: (B, 1, 3D). Returns (patches_out (B, f, n, D),
    cls_out (B, 1, D)) in standard head-major feature order.

    segs_per_block=1 (112 programs at B*S=112) measures FASTER than 2 on a
    v5e chip despite half the DMA amortization: space 3.55 -> 3.01, time
    2.42 -> 2.32 ms/layer-call (trace-based A/B, round 3). Smaller programs
    give Mosaic finer DMA/compute pipelining granularity and halve the VMEM
    working set; segs=4 does not even fit the 100 MB scoped-vmem limit."""
    b, f, n, threed = qkv_patches.shape
    d = threed // 3
    dh = d // num_heads
    hpg = max(1, 128 // dh)
    width = hpg * dh
    assert num_heads % hpg == 0 and width % 128 == 0, "use the packed kernel"
    while segs_per_block > 1 and b % segs_per_block != 0:
        segs_per_block //= 2
    kernel = functools.partial(_kernel_4d, mode=mode, head_dim=dh,
                               width=width, segs=segs_per_block, d=d)
    return pl.pallas_call(
        kernel,
        grid=(b // segs_per_block,),
        in_specs=[pl.BlockSpec((segs_per_block, f, n, threed),
                               lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((segs_per_block, 1, threed),
                               lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((segs_per_block, f, n, d),
                                lambda bi: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((segs_per_block, 1, d),
                                lambda bi: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, f, n, d), qkv_patches.dtype),
                   jax.ShapeDtypeStruct((b, 1, d), qkv_patches.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv_patches, qkv_cls)


def _divided_attention_pallas_v3(qkv, num_heads: int, num_frames: int,
                                 mode: str, segs_per_block: int = 2):
    b, seq, threed = qkv.shape
    d = threed // 3
    dh = d // num_heads
    f = num_frames
    n = (seq - 1) // f
    hpg = max(1, 128 // dh)
    width = hpg * dh
    while segs_per_block > 1 and b % segs_per_block != 0:
        segs_per_block //= 2
    kernel = functools.partial(_kernel_v3, mode=mode, num_frames=f,
                               n_tokens=n, head_dim=dh, width=width,
                               segs=segs_per_block, d=d)
    return pl.pallas_call(
        kernel,
        grid=(b // segs_per_block,),
        in_specs=[pl.BlockSpec((segs_per_block, seq, threed),
                               lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((segs_per_block, seq, d),
                               lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, seq, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv)


def divided_attention_pallas(qkv: jnp.ndarray, num_heads: int, num_frames: int,
                             mode: str, segs_per_block: int = 4) -> jnp.ndarray:
    """qkv: (B, N, 3*D) packed [q|k|v] from one Dense matmul, tokens ordered
    [CLS, frame-major patches]. Returns (B, N, D) attention outputs ready for
    the output projection."""
    b, seq, threed = qkv.shape
    d = threed // 3
    dh = d // num_heads
    f = num_frames
    n = (seq - 1) // f
    assert 1 + f * n == seq

    # block width must be a multiple of 128 lanes (or the full D)
    hpb = max(1, 128 // dh)
    if num_heads % hpb == 0 and (dh * hpb) % 128 == 0:
        # v3: contiguous full-width blocks, lane-masked head pairs
        return _divided_attention_pallas_v3(qkv, num_heads, num_frames, mode)
    if num_heads % hpb != 0 or (dh * hpb) % 128 != 0:
        hpb = num_heads  # full-D blocks (small models / tests)
    n_blocks = num_heads // hpb
    width = hpb * dh
    while segs_per_block > 1 and b % segs_per_block != 0:
        segs_per_block //= 2

    kernel = functools.partial(_kernel, mode=mode, num_frames=f, n_tokens=n,
                               heads_per_block=hpb, head_dim=dh,
                               segs=segs_per_block)

    def col_spec(which: int):
        # q/k/v live at column offsets 0/D/2D; head-block hi at offset hi*width
        return pl.BlockSpec(
            (segs_per_block, seq, width),
            lambda bi, hi, w=which: (bi, 0, w * n_blocks + hi),
            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b // segs_per_block, n_blocks),
        in_specs=[col_spec(0), col_spec(1), col_spec(2)],
        out_specs=pl.BlockSpec((segs_per_block, seq, width),
                               lambda bi, hi: (bi, 0, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, seq, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv, qkv, qkv)
