"""Target-path registry: config-driven component construction.

The reference repo's single most load-bearing pattern is reflective
instantiation of components from ``target:``/``params:`` entries in YAML
(ref: utils/utils.py:78-88). We keep that capability — configs name a
component by a dotted path and pass kwargs — but back it with an explicit
registry so that (a) targets are validated, (b) reference target names
(``model.sync_model.Synchformer`` etc.) can be aliased onto our TPU-native
classes for checkpoint/config compatibility.
"""
from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Mapping

_REGISTRY: Dict[str, Any] = {}


def register(*names: str) -> Callable:
    """Class/function decorator: register under one or more target names."""

    def deco(obj):
        for name in names:
            if name in _REGISTRY and _REGISTRY[name] is not obj:
                raise ValueError(f"duplicate registry entry: {name}")
            _REGISTRY[name] = obj
        return obj

    return deco


def _populate_default_registry():
    """Import the modules that register reference target aliases (lazy so that
    `import synchformer_tpu` stays light)."""
    import synchformer_tpu.data.datasets  # noqa: F401
    import synchformer_tpu.models  # noqa: F401


def get_registered(target: str) -> Any:
    """Resolve a target name: registry first, then dotted import path."""
    if target in _REGISTRY:
        return _REGISTRY[target]
    if target.startswith(("model.", "dataset.", "torch.nn.")):
        # reference-config target names resolve through the alias registry
        _populate_default_registry()
        if target in _REGISTRY:
            return _REGISTRY[target]
    if "." in target:
        module_name, attr = target.rsplit(".", 1)
        try:
            module = importlib.import_module(module_name)
            return getattr(module, attr)
        except (ImportError, AttributeError) as e:
            raise KeyError(f"unknown target {target!r}: {e}") from e
    raise KeyError(f"unknown target {target!r}")


def instantiate_from_config(config: Mapping[str, Any], **extra_kwargs) -> Any:
    """Build the object named by ``config['target']`` with ``config['params']``.

    Mirrors the reference's reflective constructor (ref: utils/utils.py:85-88)
    but resolves through the registry so reference target names map onto
    TPU-native implementations.
    """
    if "target" not in config:
        raise KeyError(f"config has no 'target': {dict(config)!r}")
    cls = get_registered(config["target"])
    params = dict(config.get("params") or {})
    params.update(extra_kwargs)
    return cls(**params)
