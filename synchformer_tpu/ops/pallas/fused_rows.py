"""Row-chunked fused prologue/epilogue kernels: LN+matmul and LN+MLP.

The round-2 megakernels in fused_block.py fused LN+QKV+attention (and
LN+MLP) into ONE program per segment; that measured SLOWER than the XLA
composition on v5e because the monolithic per-segment body serializes the
VPU work (LN stats, GELU) against the MXU matmuls — XLA wins by pipelining
the elementwise epilogue of one tile against the matmul of the next.

These kernels keep the fusion benefit (the LN output / fc1 intermediate
never round-trips to HBM) but restore the pipelining: the token axis is
FLATTENED (B*N rows — a free reshape) and the grid runs over row chunks
with the weights resident in VMEM (constant index_map: Mosaic keeps them
across programs). Chunk i+1's matmul has no data dependence on chunk i's
VPU epilogue, so the hardware's independent MXU/VPU issue queues overlap
them across grid steps.

HBM traffic per layer (B*N=175728, D=768, hidden=3072, bf16):
    unfused LN->fc1->gelu->fc2:  x 2x (LN r/w) + 1.08 GB fc1 out + 1.08 GB
                                 fc2 in + 270 MB out  = ~3.8 GB
    fused_ln_mlp_residual:       270 MB in + 270 MB out = 0.54 GB

Numerics identical to the module path: shared layer_norm/dense/GELU
helpers from fused_block.py (flax LN f32 stats, erf-GELU via a clamped
degree-9 odd polynomial — |err| <= ~3e-5, far below bf16 resolution).
Backward (training) reuses the XLA-composed reference via jax.custom_vjp,
exactly like fused_block.py.
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


def _row_chunk(n_rows: int, target: int = 512) -> int:
    """Largest multiple-of-8 divisor of n_rows that is <= target."""
    best = 0
    for r in range(8, min(target, n_rows) + 1, 8):
        if n_rows % r == 0:
            best = r
    return best


# ---------------------------------------------------------------------------
# LN + matmul (the QKV projection prologue)
# ---------------------------------------------------------------------------

def _ln_matmul_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *, eps):
    dtype = x_ref.dtype
    ln = layer_norm(x_ref[...], g_ref[0], b_ref[0], eps, dtype)
    y = jnp.dot(ln, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (y + bias_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_matmul_pallas(x, g, b, w, bias, eps: float):
    *lead, d = x.shape
    dout = w.shape[1]
    x2 = x.reshape(-1, d)
    rows = _row_chunk(x2.shape[0])
    if rows == 0:
        return dense(layer_norm(x, g, b, eps, x.dtype), w, bias, x.dtype)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
        grid=(x2.shape[0] // rows,),
        in_specs=[pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d),
                  pl.BlockSpec((d, dout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(dout)],
        out_specs=pl.BlockSpec((rows, dout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x2, g.reshape(1, d), b.reshape(1, d), w.astype(x.dtype),
      bias.reshape(1, dout))
    return out.reshape(*lead, dout)


def _ln_matmul_ref(x, g, b, w, bias, eps: float):
    return dense(layer_norm(x, g, b, eps, x.dtype), w.astype(x.dtype),
                 bias, x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_ln_matmul_vjp(x, g, b, w, bias, eps: float = 1e-6):
    return _ln_matmul_pallas(x, g, b, w, bias, eps)


def fused_ln_matmul(x, g, b, w, bias, eps: float = 1e-6):
    """dense(LayerNorm(x)) with the normalized activations never leaving
    VMEM. Row-chunked grid; weights resident across programs. Runs per data
    shard under an active data mesh (parallel/mesh.py::data_sharded_kernel)."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    return data_sharded_kernel(
        lambda *a: _fused_ln_matmul_vjp(*a, eps=eps),
        batched=(0,), replicated=(1, 2, 3, 4))(x, g, b, w, bias)


def _ln_matmul_fwd(x, g, b, w, bias, eps):
    return _ln_matmul_pallas(x, g, b, w, bias, eps), (x, g, b, w, bias)


def _ln_matmul_bwd(eps, res, grad):
    _, vjp = jax.vjp(lambda *a: _ln_matmul_ref(*a, eps=eps), *res)
    return vjp(grad)


_fused_ln_matmul_vjp.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


# ---------------------------------------------------------------------------
# LN + MLP + residual
# ---------------------------------------------------------------------------

def _ln_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, *stats_ref, eps):
    dtype = x_ref.dtype
    x = x_ref[...]
    ln = layer_norm(x, g_ref[0], b_ref[0], eps, dtype)
    h32 = jnp.dot(ln, w1_ref[...], preferred_element_type=jnp.float32)
    h32 = h32 + b1_ref[0].astype(jnp.float32)
    h = _gelu_kernel_f32(h32).astype(dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32)
    out = x + y.astype(dtype)
    o_ref[...] = out
    if stats_ref:
        o32 = out.astype(jnp.float32)
        mean = jnp.mean(o32, axis=-1, keepdims=True)
        msq = jnp.mean(o32 * o32, axis=-1, keepdims=True)
        pad = jnp.zeros((o32.shape[0], 6), jnp.float32)
        stats_ref[0][...] = jnp.concatenate([mean, msq, pad], axis=1)


def _ln_mlp_slab_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        o_ref, *stats_ref, eps, slabs):
    dtype = x_ref.dtype
    for s in range(slabs):
        x = x_ref[s]
        ln = layer_norm(x, g_ref[0], b_ref[0], eps, dtype)
        h32 = jnp.dot(ln, w1_ref[...], preferred_element_type=jnp.float32)
        h = _gelu_kernel_f32(h32 + b1_ref[0].astype(jnp.float32)).astype(dtype)
        y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
        out = x + (y + b2_ref[0].astype(jnp.float32)).astype(dtype)
        o_ref[s] = out
        if stats_ref:
            # LayerNorm statistics of the WRITTEN (dtype-cast) output, for
            # the next block's pre-attention LN: one HBM re-read of the
            # (n, D) slab saved per consumer. Same numerics as the XLA
            # stats fusion (f32 reduce of the cast values). Stored as
            # (n, 8) lanes [mean, meansq, 0...] — lane-reduces produce
            # (n, 1) and an 8-lane block keeps the output legal/cheap.
            o32 = out.astype(jnp.float32)
            mean = jnp.mean(o32, axis=-1, keepdims=True)      # (n, 1)
            msq = jnp.mean(o32 * o32, axis=-1, keepdims=True)
            pad = jnp.zeros((o32.shape[0], 6), jnp.float32)
            stats_ref[0][s] = jnp.concatenate([mean, msq, pad], axis=1)


def layer_norm_from_stats(x, mean, msq, scale, bias, eps: float, dtype):
    """flax LayerNorm numerics applied with PRE-COMPUTED row statistics
    (mean and mean-of-squares over the feature axis, f32, shapes
    broadcastable to x[..., :1]) — the stats the slab kernel emits for its
    own output, saving the consumer's full re-read of x for the reduce."""
    x32 = x.astype(jnp.float32)
    var = jnp.maximum(msq - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def _ln_mlp_pallas_slab(x, g, b, w1, b1, w2, b2, eps: float,
                        emit_stats: bool = False):
    """Slab-chunked variant for >=3D inputs whose token axis is NOT a
    sublane multiple (e.g. the tower's (B, f, 196, D) split-patches layout):
    flattening such an array to (rows, D) is a PAID relayout (the 4D tiling
    pads 196 -> 200 sublanes), so instead the grid runs over whole (n, D)
    slabs — only the leading dims reshape, which is free — and each slab
    matmuls at a ~2% sublane-padding cost instead of ~20 ms/step of copies."""
    *lead, n, d = x.shape
    hdim = w1.shape[1]
    x3 = x.reshape(-1, n, d)
    n_slabs = x3.shape[0]
    slabs = 1
    # chip sweep at (896, 196, 768)x3072: slabs=2 13.37 ms, 1 13.60,
    # 4 13.82, 8 14.45, 14 14.27 — small programs pipeline DMA best, but
    # singles pay too much per-program overhead
    for c in (2, 3):
        if n_slabs % c == 0:
            slabs = c
            break
    vec = lambda m: pl.BlockSpec((1, m), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out_specs = pl.BlockSpec((slabs, n, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(x3.shape, x.dtype)
    if emit_stats:
        out_specs = [out_specs,
                     pl.BlockSpec((slabs, n, 8), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((n_slabs, n, 8), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_ln_mlp_slab_kernel, eps=eps, slabs=slabs),
        grid=(n_slabs // slabs,),
        in_specs=[pl.BlockSpec((slabs, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d),
                  pl.BlockSpec((d, hdim), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(hdim),
                  pl.BlockSpec((hdim, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d)],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x3, g.reshape(1, d), b.reshape(1, d), w1.astype(x.dtype),
      b1.reshape(1, hdim), w2.astype(x.dtype), b2.reshape(1, d))
    if emit_stats:
        y, stats = out
        return y.reshape(x.shape), stats.reshape(*x.shape[:-1], 8)
    return out.reshape(x.shape)


def _ln_mlp_pallas(x, g, b, w1, b1, w2, b2, eps: float,
                   emit_stats: bool = False):
    *lead, d = x.shape
    hdim = w1.shape[1]
    if x.ndim >= 3 and x.shape[-2] % 8 != 0 and x.shape[-2] >= 64:
        return _ln_mlp_pallas_slab(x, g, b, w1, b1, w2, b2, eps,
                                   emit_stats=emit_stats)
    x2 = x.reshape(-1, d)
    rows = _row_chunk(x2.shape[0])
    if rows == 0:
        return (_ln_mlp_stats_ref(x, g, b, w1, b1, w2, b2, eps)
                if emit_stats else
                _ln_mlp_ref(x, g, b, w1, b1, w2, b2, eps))
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out_specs = pl.BlockSpec((rows, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(x2.shape, x.dtype)
    if emit_stats:
        out_specs = [out_specs,
                     pl.BlockSpec((rows, 8), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((x2.shape[0], 8), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps),
        grid=(x2.shape[0] // rows,),
        in_specs=[pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec(d), vec(d),
                  pl.BlockSpec((d, hdim), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(hdim),
                  pl.BlockSpec((hdim, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(d)],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x2, g.reshape(1, d), b.reshape(1, d), w1.astype(x.dtype),
      b1.reshape(1, hdim), w2.astype(x.dtype), b2.reshape(1, d))
    if emit_stats:
        y, stats = out
        return y.reshape(x.shape), stats.reshape(*x.shape[:-1], 8)
    return out.reshape(x.shape)


def _ln_mlp_ref(x, g, b, w1, b1, w2, b2, eps: float):
    ln = layer_norm(x, g, b, eps, x.dtype)
    h32 = dense(ln, w1, b1, x.dtype).astype(jnp.float32)
    h = exact_gelu_f32(h32).astype(x.dtype)
    return x + dense(h, w2, b2, x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_ln_mlp_vjp(x, g, b, w1, b1, w2, b2, eps: float = 1e-6):
    return _ln_mlp_pallas(x, g, b, w1, b1, w2, b2, eps)


def fused_ln_mlp_residual(x, g, b, w1, b1, w2, b2, eps: float = 1e-6):
    """x + fc2(gelu(fc1(LN(x)))) — one HBM read + one write of x. Deterministic
    path only (no dropout); callers gate on stochastic. Runs per data shard
    under an active data mesh (parallel/mesh.py::data_sharded_kernel)."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    return data_sharded_kernel(
        lambda *a: _fused_ln_mlp_vjp(*a, eps=eps),
        batched=(0,), replicated=(1, 2, 3, 4, 5, 6))(x, g, b, w1, b1, w2, b2)


def _ln_mlp_stats_ref(x, g, b, w1, b1, w2, b2, eps: float):
    """XLA-composed (out, stats) reference mirroring the kernel numerics:
    stats are f32 reduces of the dtype-CAST output."""
    out = _ln_mlp_ref(x, g, b, w1, b1, w2, b2, eps)
    o32 = out.astype(jnp.float32)
    mean = jnp.mean(o32, axis=-1, keepdims=True)
    msq = jnp.mean(o32 * o32, axis=-1, keepdims=True)
    pad = jnp.zeros((*out.shape[:-1], 6), jnp.float32)
    return out, jnp.concatenate([mean, msq, pad], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_ln_mlp_stats_vjp(x, g, b, w1, b1, w2, b2, eps: float = 1e-6):
    return _ln_mlp_pallas(x, g, b, w1, b1, w2, b2, eps, emit_stats=True)


def _ln_mlp_stats_fwd(x, g, b, w1, b1, w2, b2, eps):
    return (_ln_mlp_pallas(x, g, b, w1, b1, w2, b2, eps, emit_stats=True),
            (x, g, b, w1, b1, w2, b2))


def _ln_mlp_stats_bwd(eps, res, grads):
    _, vjp = jax.vjp(lambda *a: _ln_mlp_stats_ref(*a, eps=eps), *res)
    return vjp(grads)


_fused_ln_mlp_stats_vjp.defvjp(_ln_mlp_stats_fwd, _ln_mlp_stats_bwd)


def fused_ln_mlp_residual_stats(x, g, b, w1, b1, w2, b2, eps: float = 1e-6):
    """Slab variant returning (out, stats) where stats[..., 0]/[..., 1] are
    the f32 mean / mean-of-squares of out's feature axis — the next block's
    pre-attention LayerNorm applies them via ``layer_norm_from_stats``
    without re-reading out for the reduce (12 x 0.37 ms/iter of stats
    fusions at the tower's shape). Backward re-derives through the XLA
    composition like the other fused kernels. Runs per data shard under an
    active data mesh."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    assert x.ndim >= 3, "stats are per-row LN statistics of a token tensor"
    return data_sharded_kernel(
        lambda *a: _fused_ln_mlp_stats_vjp(*a, eps=eps),
        batched=(0,), replicated=(1, 2, 3, 4, 5, 6), n_out=2)(
            x, g, b, w1, b1, w2, b2)


def _ln_mlp_fwd(x, g, b, w1, b1, w2, b2, eps):
    return (_ln_mlp_pallas(x, g, b, w1, b1, w2, b2, eps),
            (x, g, b, w1, b1, w2, b2))


def _ln_mlp_bwd(eps, res, grad):
    _, vjp = jax.vjp(lambda *a: _ln_mlp_ref(*a, eps=eps), *res)
    return vjp(grad)


_fused_ln_mlp_vjp.defvjp(_ln_mlp_fwd, _ln_mlp_bwd)
