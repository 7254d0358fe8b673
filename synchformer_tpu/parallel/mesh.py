"""Device mesh + sharding layout for SPMD training.

The reference's only parallelism is DDP over NCCL (ref:
scripts/train_utils.py:53-70,208-212; SURVEY.md §2.3). The TPU-native
equivalent is ONE jitted SPMD program over a ``jax.sharding.Mesh``:

- axis ``data``  — batch sharding; gradient averaging is an XLA ``psum``
  inserted automatically by jit (DDP's all-reduce, riding ICI)
- axis ``model`` — optional tensor parallelism: Dense kernels are sharded on
  their output features where divisible, replicated otherwise. The 768-dim
  towers don't *need* TP for capacity (SURVEY.md §2.3), but the layout keeps
  activation memory flat as per-chip batch grows and exercises the full
  tp x dp sharding machinery.

Barriers, rank broadcasts and object gathers from the torch version dissolve:
SPMD program order replaces barriers, ``jax.experimental.multihost_utils``
covers host-side broadcast/gather (see train/metrics.py for the eval gather
semantics: lists concatenate, floats average — ref: train_utils.py:615-629).
"""
from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    devices = devices[: n_data * n_model]
    dev_array = mesh_utils.create_device_mesh((n_data, n_model), devices=np.array(devices))
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def commit_to_mesh(tree, mesh: Mesh):
    """Re-commit restored checkpoint leaves to this mesh.

    orbax restores each leaf with the *template's* sharding; template leaves
    that were uncommitted scalars (e.g. optax ``count``, the step counter)
    come back COMMITTED to the default device only. jit then rejects the
    mixed committed device sets ("Received incompatible devices for jitted
    computation"). Keep leaves already laid out on this mesh, replicate
    everything else onto it.
    """
    rep = replicated(mesh)

    def put(x):
        s = getattr(x, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return x
        return jax.device_put(jax.numpy.asarray(x), rep)

    return jax.tree.map(put, tree)


# ---------------------------------------------------------------------------
# pallas kernels under SPMD
# ---------------------------------------------------------------------------
#
# XLA's SPMD partitioner has no partitioning rule for pallas custom calls
# (and rejects their interpret-mode io_callbacks outright: "side-effect HLO
# cannot have a replicated sharding"). The kernels are batch-leading and
# reduction-free across the batch, so under a >1-device 'data' axis each
# shard simply runs its own kernel via shard_map — semantics identical, and
# the VJP composes (replicated weight args get their cotangent psum exactly
# like the XLA path's DP gradient).

_ACTIVE_DATA_MESH: Optional[Mesh] = None


def set_active_data_mesh(mesh: Optional[Mesh]) -> None:
    """Register the mesh whose 'data' axis pallas entry points shard over.

    Trainers and the multichip dryrun call this right after make_mesh; a
    1-device data axis (the single-chip bench) deactivates the wrapper.
    Kernel batch dims must divide the data-axis size — the trainers already
    assert batch_size %% n_data == 0."""
    global _ACTIVE_DATA_MESH
    if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
        _ACTIVE_DATA_MESH = mesh
    else:
        _ACTIVE_DATA_MESH = None


def active_data_mesh() -> Optional[Mesh]:
    return _ACTIVE_DATA_MESH


def data_sharded_kernel(fn, batched, replicated=(), n_out: int = 1):
    """Call ``fn(*arrays)`` per data shard when a data mesh is active.

    ``batched``/``replicated`` are positional indices of fn's array arguments
    (batch-leading vs broadcast weights); all other arguments must be static
    python values closed over by the caller. Identity without an active mesh.
    """

    def call(*args, **kwargs):
        mesh = _ACTIVE_DATA_MESH
        if mesh is None:
            return fn(*args, **kwargs)
        arr_idx = sorted(tuple(batched) + tuple(replicated))

        def inner(*shard_arrays):
            full = list(args)
            for j, i in enumerate(arr_idx):
                full[i] = shard_arrays[j]
            return fn(*full, **kwargs)

        in_specs = tuple(P(DATA_AXIS) if i in batched else P()
                         for i in arr_idx)
        out_specs = (P(DATA_AXIS) if n_out == 1
                     else tuple(P(DATA_AXIS) for _ in range(n_out)))
        return jax.shard_map(inner, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(
            *[args[i] for i in arr_idx])

    return call


# parameters whose output-feature dim is safe to shard over 'model':
# QKV/proj/MLP kernels of every tower and the sync transformer
_TP_SHARDABLE = re.compile(
    r"(qkv|proj|fc1|fc2|linear|dense)$"
)


def param_shardings(params, mesh: Mesh):
    """Per-parameter NamedSharding: TP on Dense kernels where divisible,
    replicated otherwise."""
    tp = mesh.shape[MODEL_AXIS]

    def spec_for(path, x) -> NamedSharding:
        if tp > 1 and x.ndim == 2 and x.shape[-1] % tp == 0:
            parent = path[-2].key if len(path) >= 2 else ""
            leaf = path[-1].key if path else ""
            if leaf == "kernel" and _TP_SHARDABLE.search(parent):
                return NamedSharding(mesh, P(None, MODEL_AXIS))
        if tp > 1 and x.ndim == 1 and x.shape[-1] % tp == 0:
            parent = path[-2].key if len(path) >= 2 else ""
            leaf = path[-1].key if path else ""
            if leaf == "bias" and _TP_SHARDABLE.search(parent):
                return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
