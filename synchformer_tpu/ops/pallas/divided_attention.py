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
