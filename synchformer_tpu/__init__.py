"""synchformer_tpu — a TPU-native (JAX/XLA/Pallas) audio-visual synchronization framework.

Re-designed from scratch with the capability surface of v-iashin/Synchformer
(audio-visual offset prediction + synchronizability), built TPU-first:

- device-side DSP front-end (mel spectrogram as MXU matmuls, ``ops/mel.py``)
- segment-batched ViT towers (AST audio, divided space-time video) in flax
- SPMD training over a ``jax.sharding.Mesh`` (data/model axes) via jit/shard_map
- orbax checkpoints + a converter for the reference PyTorch checkpoints

Reference behavior citations use ``ref:`` prefixes pointing into the upstream
repo (e.g. ``ref: model/sync_model.py:38``) so parity can be audited.
"""

__version__ = "0.1.0"

from synchformer_tpu.registry import register, get_registered, instantiate_from_config  # noqa: F401
