"""Fused standard multi-head self-attention (full softmax, no mask).

Used by the factorized aggregators (spatial/frequency/temporal CLS pools),
the AST encoder blocks and the sync transformer — everywhere the model
runs vanilla attention (ref: motionformer.py:275-347, hf_src/
modeling_ast.py:488-545, model/modules/transformer.py:31-76). The XLA
path materializes (B, H, N, N) f32 logits in HBM (1.7 GB for the spatial
aggregator at B*S*f=896, N=197); this kernel keeps the whole softmax in
VMEM using the same recipe as the v3 divided-attention kernels:

- grid over batch chunks; ONE contiguous full-width (chunk, N, 3D) block
- heads processed in 128-lane PAIRS straight out of the packed [q|k|v]
  projection (pair slices are 128-aligned by construction); the two heads
  separate by LANE MASKING on the Q/V sides, so their outputs land packed
  in standard head-major order
- no transposed operands (dot_general on the minor dim)

Differentiable via custom VJP whose backward is the XLA composition (the
same math the fallback path runs — aggregators train in Stage I).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NT = (((1,), (1,)), ((), ()))  # (a, K) x (b, K) -> (a, b)


def groupable(num_heads: int, head_dim: int) -> bool:
    hpg = max(1, 128 // head_dim)
    return num_heads % hpg == 0 and (head_dim * hpg) % 128 == 0


def _kernel(x_ref, o_ref, *, head_dim: int, width: int, chunk: int, d: int):
    n_pairs = d // width
    scale = jnp.asarray(head_dim ** -0.5, x_ref.dtype)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    masks = [(lanes // head_dim == i).astype(x_ref.dtype)
             for i in range(width // head_dim)]
    w = width
    for s in range(chunk):
        for p in range(n_pairs):
            q = x_ref[s, :, p * w:(p + 1) * w] * scale
            k = x_ref[s, :, d + p * w:d + (p + 1) * w]
            v = x_ref[s, :, 2 * d + p * w:2 * d + (p + 1) * w]
            out = jnp.zeros(q.shape, jnp.float32)
            for qm in masks:
                logits = jax.lax.dot_general(
                    q * qm, k, _NT, preferred_element_type=jnp.float32)
                m = jnp.max(logits, axis=-1, keepdims=True)
                e = jnp.exp(logits - m)
                probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
                out = out + jnp.dot(probs, v * qm.astype(v.dtype),
                                    preferred_element_type=jnp.float32)
            o_ref[s, :, p * w:(p + 1) * w] = out.astype(o_ref.dtype)


def _standard_attention_pallas(qkv, num_heads: int, chunk: int = 8):
    b, n, threed = qkv.shape
    d = threed // 3
    dh = d // num_heads
    hpg = max(1, 128 // dh)
    width = hpg * dh
    while chunk > 1 and b % chunk != 0:
        chunk //= 2
    kernel = functools.partial(_kernel, head_dim=dh, width=width,
                               chunk=chunk, d=d)
    return pl.pallas_call(
        kernel,
        grid=(b // chunk,),
        in_specs=[pl.BlockSpec((chunk, n, threed), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, n, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv)


def standard_attention_ref(qkv, num_heads: int):
    """XLA reference: head-split fp32-softmax attention (identical math to
    models/layers.py::scaled_dot_attention on the packed qkv)."""
    b, n, threed = qkv.shape
    d = threed // 3
    dh = d // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    q, k, v = split(q) * (dh ** -0.5), split(k), split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(qkv.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _standard_attention_vjp(qkv, num_heads: int):
    return _standard_attention_pallas(qkv, num_heads)


def _fwd(qkv, num_heads):
    return _standard_attention_pallas(qkv, num_heads), qkv


def _bwd(num_heads, qkv, g):
    _, vjp = jax.vjp(lambda x: standard_attention_ref(x, num_heads), qkv)
    return vjp(g)


_standard_attention_vjp.defvjp(_fwd, _bwd)


def standard_attention(qkv, num_heads: int):
    """Fused full attention over packed (B, N, 3D) qkv -> (B, N, D).
    Runs per data shard under an active data mesh (pallas custom calls have
    no SPMD partitioning rule — parallel/mesh.py::data_sharded_kernel)."""
    from synchformer_tpu.parallel.mesh import data_sharded_kernel

    return data_sharded_kernel(
        lambda q: _standard_attention_vjp(q, num_heads), batched=(0,))(qkv)
