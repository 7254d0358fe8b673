"""Import the ACTUAL reference code at /root/reference for golden parity tests.

The reference depends on two packages missing from this image: `timm` (only a
handful of symbols on the divided-attention path) and `omegaconf` (attribute-
style config access). This module installs minimal stand-ins in sys.modules,
puts the reference roots on sys.path, and exposes `load_ref_module(name)`.

The stand-ins implement real behavior (timm's DropPath/trunc_normal_ are the
standard definitions), NOT mocks — the parity tests exercise the reference's
own forward passes, so anything the forward touches must be faithful.

Used by tests/test_reference_golden.py; import this before any reference
module. Safe to import multiple times.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path

import torch
import yaml

REF_ROOT = Path("/root/reference")


# ---------------------------------------------------------------------------
# omegaconf stand-in: dict with recursive attribute get/set (what the
# reference's import-time path actually uses: OmegaConf.load + field access +
# field assignment, ref: visual/motionformer.py:95-104)
# ---------------------------------------------------------------------------

class DotDict(dict):
    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value


def to_dotdict(obj):
    if isinstance(obj, dict):
        return DotDict({k: to_dotdict(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [to_dotdict(v) for v in obj]
    return obj


def _install_omegaconf():
    if "omegaconf" in sys.modules:
        return
    mod = types.ModuleType("omegaconf")

    class OmegaConf:
        @staticmethod
        def load(path):
            with open(path) as f:
                return to_dotdict(yaml.safe_load(f))

        @staticmethod
        def create(obj=None):
            return to_dotdict(obj if obj is not None else {})

        @staticmethod
        def to_container(cfg, resolve=True):
            def back(o):
                if isinstance(o, dict):
                    return {k: back(v) for k, v in o.items()}
                if isinstance(o, list):
                    return [back(v) for v in o]
                return o
            return back(cfg)

        @staticmethod
        def merge(*cfgs):
            out: DotDict = DotDict()

            def merge_into(dst, src):
                for k, v in src.items():
                    if isinstance(v, dict) and isinstance(dst.get(k), dict):
                        merge_into(dst[k], v)
                    else:
                        dst[k] = to_dotdict(v)
            for c in cfgs:
                merge_into(out, c)
            return out

    mod.OmegaConf = OmegaConf
    mod.DictConfig = DotDict
    mod.ListConfig = list
    sys.modules["omegaconf"] = mod


# ---------------------------------------------------------------------------
# timm stand-in (symbols imported by motionformer_src/vit_helper.py:19-22 and
# video_model_builder.py:12)
# ---------------------------------------------------------------------------

class _DropPath(torch.nn.Module):
    """Stochastic depth (timm definition); identity in eval mode."""

    def __init__(self, drop_prob: float = 0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep_prob = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        rand = keep_prob + torch.rand(shape, dtype=x.dtype, device=x.device)
        return x.div(keep_prob) * rand.floor_()


def _install_timm():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = _DropPath
    layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    layers.trunc_normal_ = (
        lambda tensor, mean=0.0, std=1.0, a=-2.0, b=2.0:
        torch.nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b))
    resnet = types.ModuleType("timm.models.resnet")
    # referenced by vit_helper's hybrid-backbone builders, never called on the
    # divided/joint paths the parity tests use
    resnet.resnet26d = None
    resnet.resnet50d = None
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn

    timm.data = data
    timm.models = models
    models.layers = layers
    models.resnet = resnet
    models.registry = registry
    import importlib.machinery

    for name, m in (("timm", timm), ("timm.data", data), ("timm.models", models),
                    ("timm.models.layers", layers), ("timm.models.resnet", resnet),
                    ("timm.models.registry", registry)):
        # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
        # optional-dependency probing) doesn't choke on the stand-in
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = m


class _FrozenBatchNorm2d(torch.nn.Module):
    """torchvision.ops.misc.FrozenBatchNorm2d semantics: BatchNorm2d with
    fixed affine params and running stats (used only on the reference's
    vestigial CLIP-vision path; imported by open_clip/utils.py:5)."""

    def __init__(self, num_features: int, eps: float = 1e-5):
        super().__init__()
        self.eps = eps
        self.register_buffer("weight", torch.ones(num_features))
        self.register_buffer("bias", torch.zeros(num_features))
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))

    def forward(self, x):
        w = self.weight.reshape(1, -1, 1, 1)
        b = self.bias.reshape(1, -1, 1, 1)
        rm = self.running_mean.reshape(1, -1, 1, 1)
        rv = self.running_var.reshape(1, -1, 1, 1)
        scale = w * (rv + self.eps).rsqrt()
        return x * scale + (b - rm * scale)


def _install_torchvision():
    if "torchvision" in sys.modules:
        return
    import importlib.machinery

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    misc = types.ModuleType("torchvision.ops.misc")
    misc.FrozenBatchNorm2d = _FrozenBatchNorm2d
    tv.ops = ops
    ops.misc = misc
    for name, m in (("torchvision", tv), ("torchvision.ops", ops),
                    ("torchvision.ops.misc", misc)):
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = m


def install():
    """Install shims and reference sys.path entries (idempotent)."""
    _install_omegaconf()
    _install_timm()
    _install_torchvision()
    for p in (str(REF_ROOT),
              str(REF_ROOT / "model" / "modules" / "feat_extractors" / "visual")):
        if p not in sys.path:
            sys.path.append(p)  # append, not insert: never shadow repo modules


def load_ref_module(name: str):
    """Import a reference module by its dotted name, e.g. 'model.sync_model'
    or 'motionformer_src.vit_helper'."""
    install()
    import importlib

    return importlib.import_module(name)
