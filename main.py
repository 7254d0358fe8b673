"""CLI dispatcher: ``python main.py config=<yaml> [key.path=value ...]``.

Capability parity with ref: main.py:8-46 — YAML + CLI-dotlist merge (CLI
wins), config sanity pass, dispatch on ``cfg.action``:

- train_avclip                       -> Stage I contrastive pre-training
- train_avsync_model                 -> Stage II offset training
- ft_avsync_model_for_syncability    -> Stage III syncability fine-tune

Multi-host SPMD initializes from the environment via
``jax.distributed.initialize`` when JAX_COORDINATOR_ADDRESS (or the TPU
runtime) provides topology — the TPU-native replacement for the reference's
SLURM/torchrun env plumbing (ref: main.py:8-17, scripts/sbatch_*.sh).
"""
from __future__ import annotations

import logging
import os
import sys


def get_config(argv):
    from synchformer_tpu.config import load_config, merge_cli_overrides
    from synchformer_tpu.config.sanity import cfg_sanity_check_and_patch

    kv = dict(item.split("=", 1) for item in argv if "=" in item)
    assert "config" in kv, "usage: python main.py config=<yaml> [k.path=v ...]"
    cfg = load_config(kv.pop("config"))
    merge_cli_overrides(cfg, [f"{k}={v}" for k, v in kv.items()])
    cfg_sanity_check_and_patch(cfg)
    return cfg


def maybe_init_distributed():
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    logging.info(f"processes={jax.process_count()} devices={jax.device_count()}")


def main():
    logging.basicConfig(level=logging.INFO)
    cfg = get_config(sys.argv[1:])
    maybe_init_distributed()
    action = cfg["action"]
    cfg_dict = cfg.to_dict()
    if action == "train_avclip":
        from synchformer_tpu.train.stage_clip import train

        train(cfg_dict)
    elif action in ("train_avsync_model", "ft_avsync_model_for_syncability"):
        from synchformer_tpu.train.stage_sync import train

        train(cfg_dict)
    else:
        raise NotImplementedError(f"action {action!r}")


if __name__ == "__main__":
    main()
