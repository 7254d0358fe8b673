"""Checkpointing: orbax-native save/load + PyTorch reference-ckpt conversion.

Native checkpoints (orbax):
- Stage II/III ckpt payload mirrors the reference dict {args/cfg, loss,
  metrics, epoch, model, optimizer, lr/scaler state} (ref: utils/logger.py:139-160)
  as {params, opt_state, step, epoch, metrics, cfg}; best/latest naming and
  atomic replace semantics come from orbax itself (the reference hand-rolls
  tmp->os.replace, ref: train_clip.py:425-441).

Torch -> flax conversion covers the three reference checkpoint layouts
(SURVEY.md §5 checkpoint/resume):
- Stage II/III sync ckpts  ({'model': sd, 'args': cfg}, ref: logger.py:139-160)
- Stage I AVCLIP ckpts     ({'state_dict': sd} with module./a_encoder./
  v_encoder. prefixes, ref: ast.py:113-132, motionformer.py:156-173)
- raw tower ckpts (HF AST, FB Motionformer .pyth) including the reference's
  positional-embedding trim rules (ref: ast.py:240-245, sync_model.py:101-114).
"""
from __future__ import annotations

import logging
import re
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import numpy as np


# ---------------------------------------------------------------------------
# low-level torch tensor -> numpy
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _linear(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch Linear -> flax Dense {kernel, bias} (weight transposed)."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _fused_qkv_from_separate(sd: Mapping, q: str, k: str, v: str) -> Dict[str, np.ndarray]:
    """Three torch Linears -> one fused (D, 3D) [q|k|v] Dense."""
    kernel = np.concatenate(
        [_np(sd[f"{q}.weight"]).T, _np(sd[f"{k}.weight"]).T, _np(sd[f"{v}.weight"]).T],
        axis=1)
    out = {"kernel": kernel}
    if f"{q}.bias" in sd:
        out["bias"] = np.concatenate(
            [_np(sd[f"{q}.bias"]), _np(sd[f"{k}.bias"]), _np(sd[f"{v}.bias"])])
    return out


def _fused_qkv_from_packed(sd: Mapping, prefix: str,
                           weight_key: str = "weight",
                           bias_key: str = "bias") -> Dict[str, np.ndarray]:
    """torch packed-qkv Linear (rows [q;k;v]) -> fused Dense (cols [q|k|v])."""
    out = {"kernel": _np(sd[f"{prefix}.{weight_key}"]).T}
    if f"{prefix}.{bias_key}" in sd:
        out["bias"] = _np(sd[f"{prefix}.{bias_key}"])
    return out


def _conv(sd: Mapping, prefix: str, ndim: int) -> Dict[str, np.ndarray]:
    """torch ConvNd (O, I, *K) -> flax Conv kernel (*K, I, O)."""
    w = _np(sd[f"{prefix}.weight"])
    perm = tuple(range(2, 2 + ndim)) + (1, 0)
    out = {"kernel": w.transpose(perm)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


# ---------------------------------------------------------------------------
# composite blocks
# ---------------------------------------------------------------------------

def convert_preln_block_from_separate_qkv(sd, p) -> Dict:
    """minGPT Block (ref: model/modules/transformer.py:79-97): separate
    key/query/value Linears, mlp Sequential [Linear, GELU, Linear, Dropout]."""
    return {
        "ln1": _layernorm(sd, f"{p}.ln1"),
        "ln2": _layernorm(sd, f"{p}.ln2"),
        "attn": {
            "qkv": _fused_qkv_from_separate(sd, f"{p}.attn.query", f"{p}.attn.key",
                                            f"{p}.attn.value"),
            "proj": _linear(sd, f"{p}.attn.proj"),
        },
        "mlp": {"fc1": _linear(sd, f"{p}.mlp.0"), "fc2": _linear(sd, f"{p}.mlp.2")},
    }


def convert_hf_ast_layer(sd, p) -> Dict:
    """HF ASTLayer (ref: hf_src/modeling_ast.py:281-323)."""
    att = f"{p}.attention"
    return {
        "ln1": _layernorm(sd, f"{p}.layernorm_before"),
        "ln2": _layernorm(sd, f"{p}.layernorm_after"),
        "attn": {
            "qkv": _fused_qkv_from_separate(
                sd, f"{att}.attention.query", f"{att}.attention.key",
                f"{att}.attention.value"),
            "proj": _linear(sd, f"{att}.output.dense"),
        },
        "mlp": {"fc1": _linear(sd, f"{p}.intermediate.dense"),
                "fc2": _linear(sd, f"{p}.output.dense")},
    }


def convert_torch_encoder_layer(sd, p) -> Dict:
    """nn.TransformerEncoderLayer(norm_first) -> PreLNBlock subtree; used by
    every aggregator (BaseEncoderLayer, ref: visual/motionformer.py:275-347)."""
    return {
        "ln1": _layernorm(sd, f"{p}.norm1"),
        "ln2": _layernorm(sd, f"{p}.norm2"),
        "attn": {
            "qkv": _fused_qkv_from_packed(sd, f"{p}.self_attn", "in_proj_weight",
                                          "in_proj_bias"),
            "proj": _linear(sd, f"{p}.self_attn.out_proj"),
        },
        "mlp": {"fc1": _linear(sd, f"{p}.linear1"), "fc2": _linear(sd, f"{p}.linear2")},
    }


def convert_cls_pool_layer(sd, p, has_pos_emb: bool = False) -> Dict:
    """BaseEncoderLayer (CLS token + encoder layer [+ pos emb])."""
    out = {"cls_token": _np(sd[f"{p}.cls_token"]),
           "block": convert_torch_encoder_layer(sd, p)}
    if has_pos_emb or f"{p}.pos_emb" in sd:
        out["pos_emb"] = _np(sd[f"{p}.pos_emb"])
    return out


# ---------------------------------------------------------------------------
# towers
# ---------------------------------------------------------------------------

def _infer_depth(sd: Mapping, pattern: str) -> int:
    depth = 0
    while f"{pattern.format(depth)}" in sd:
        depth += 1
    return depth


def convert_motionformer(sd: Mapping, prefix: str = "",
                         depth: Optional[int] = None) -> Dict:
    """Motionformer tower state dict -> MotionFormerEncoder params.

    Handles both raw .pyth layouts (model_state) and Stage-ckpt subtrees
    (vfeat_extractor. / v_encoder. prefixes are stripped by the caller).
    """
    p = prefix
    if depth is None:
        depth = _infer_depth(sd, p + "blocks.{}.norm1.weight")
    out: Dict[str, Any] = {
        "cls_token": _np(sd[f"{p}cls_token"]),
        "pos_embed": _np(sd[f"{p}pos_embed"]),
        "temp_embed": _np(sd[f"{p}temp_embed"]),
        "patch_embed_3d": _conv(sd, f"{p}patch_embed_3d.proj", 3),
        "norm": _layernorm(sd, f"{p}norm"),
    }
    for i in range(depth):
        b = f"{p}blocks.{i}"
        out[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "norm3": _layernorm(sd, f"{b}.norm3"),
            "attn": {"qkv": _fused_qkv_from_packed(sd, f"{b}.attn.qkv"),
                     "proj": _linear(sd, f"{b}.attn.proj")},
            "timeattn": {"qkv": _fused_qkv_from_packed(sd, f"{b}.timeattn.qkv"),
                         "proj": _linear(sd, f"{b}.timeattn.proj")},
            "mlp": {"fc1": _linear(sd, f"{b}.mlp.fc1"),
                    "fc2": _linear(sd, f"{b}.mlp.fc2")},
        }
    if f"{p}spatial_attn_agg.cls_token" in sd:
        out["spatial_attn_agg"] = {
            "cls_layer": convert_cls_pool_layer(sd, f"{p}spatial_attn_agg")}
    if f"{p}temp_attn_agg.cls_token" in sd:
        out["temp_attn_agg"] = {
            "cls_layer": convert_cls_pool_layer(sd, f"{p}temp_attn_agg")}
    if f"{p}global_attn_agg.cls_token" in sd:
        out["global_attn_agg"] = {
            "cls_layer": convert_cls_pool_layer(sd, f"{p}global_attn_agg",
                                                has_pos_emb=True)}
    return out


def convert_ast(sd: Mapping, prefix: str = "", depth: Optional[int] = None,
                max_patches: Optional[int] = 74) -> Dict:
    """AST tower state dict -> ASTEncoder params. Trims the positional
    embedding to the first `max_patches` positions like the reference
    (ref: audio/ast.py:240-245: pos[:, :f*t+2])."""
    p = prefix
    if depth is None:
        depth = _infer_depth(sd, p + "ast.encoder.layer.{}.layernorm_before.weight")
    pos = _np(sd[f"{p}ast.embeddings.position_embeddings"])
    if max_patches is not None and pos.shape[1] > max_patches:
        logging.info(f"trimming AST pos emb {pos.shape[1]} -> {max_patches}")
        pos = pos[:, :max_patches]
    out: Dict[str, Any] = {
        "cls_token": _np(sd[f"{p}ast.embeddings.cls_token"]),
        "distillation_token": _np(sd[f"{p}ast.embeddings.distillation_token"]),
        "position_embeddings": pos,
        "patch_embed": _conv(sd, f"{p}ast.embeddings.patch_embeddings.projection", 2),
        "layernorm": _layernorm(sd, f"{p}ast.layernorm"),
    }
    for i in range(depth):
        out[f"layer_{i}"] = convert_hf_ast_layer(sd, f"{p}ast.encoder.layer.{i}")
    if f"{p}freq_attn_agg.cls_token" in sd:
        out["freq_attn_agg"] = {
            "cls_layer": convert_cls_pool_layer(sd, f"{p}freq_attn_agg")}
    if f"{p}temp_attn_agg.cls_token" in sd:
        out["temp_attn_agg"] = {
            "cls_layer": convert_cls_pool_layer(sd, f"{p}temp_attn_agg")}
    if f"{p}global_attn_agg.cls_token" in sd:
        out["global_attn_agg"] = {
            "cls_layer": convert_cls_pool_layer(sd, f"{p}global_attn_agg",
                                                has_pos_emb=True)}
    return out


def convert_global_transformer(sd: Mapping, prefix: str = "transformer.",
                               n_layer: int = 3,
                               target_seq_len: Optional[int] = None) -> Dict:
    """GlobalTransformer state dict -> params, including the pos-emb trim rule
    for shorter target sequences (ref: model/sync_model.py:101-114)."""
    p = prefix
    out: Dict[str, Any] = {
        "vis_in_lnorm": _layernorm(sd, f"{p}vis_in_lnorm"),
        "aud_in_lnorm": _layernorm(sd, f"{p}aud_in_lnorm"),
        "OFF_tok": _np(sd[f"{p}OFF_tok"]),
        "MOD_tok": _np(sd[f"{p}MOD_tok"]),
        "ln_f": _layernorm(sd, f"{p}ln_f"),
    }
    if f"{p}pos_emb_cfg.pos_emb" in sd:
        pos = _np(sd[f"{p}pos_emb_cfg.pos_emb"])
        if target_seq_len is not None:
            if pos.shape[1] > target_seq_len:
                logging.warning(f"trimming sync pos emb {pos.shape[1]} -> {target_seq_len}")
                pos = pos[:, :target_seq_len]
            elif pos.shape[1] < target_seq_len:
                raise ValueError(
                    f"cannot load shorter pos emb ({pos.shape[1]} < {target_seq_len})")
        out["pos_emb"] = {"pos_emb": pos}
    for i in range(n_layer):
        out[f"blocks_{i}"] = convert_preln_block_from_separate_qkv(sd, f"{p}blocks.{i}")
    if f"{p}off_head.weight" in sd:
        out["off_head"] = {"linear": _linear(sd, f"{p}off_head")}
    if f"{p}sync_head.weight" in sd:
        out["sync_head"] = _linear(sd, f"{p}sync_head")
    return out


# ---------------------------------------------------------------------------
# top-level checkpoint layouts
# ---------------------------------------------------------------------------

def _strip_prefixes(sd: Mapping, prefixes) -> Dict[str, Any]:
    out = {}
    for key, value in sd.items():
        for pref in prefixes:
            if key.startswith(pref):
                out[key[len(pref):]] = value
                break
    return out


def convert_sync_checkpoint(ckpt: Mapping, target_seq_len: Optional[int] = None,
                            n_layer: Optional[int] = None,
                            tower_depth: Optional[int] = None) -> Dict:
    """Stage II/III checkpoint ({'model': sd, ...} or a bare sd) ->
    Synchformer params tree."""
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, Mapping) else ckpt
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params = {
        "v_encoder": convert_motionformer(sd, "vfeat_extractor.", depth=tower_depth),
        "a_encoder": convert_ast(sd, "afeat_extractor.", depth=tower_depth,
                                 max_patches=None),
        "v_proj": {"linear": _linear(sd, "vproj")},
        "a_proj": {"linear": _linear(sd, "aproj")},
        "sync_transformer": convert_global_transformer(
            sd, "transformer.",
            n_layer=n_layer if n_layer is not None else _infer_depth(
                sd, "transformer.blocks.{}.ln1.weight"),
            target_seq_len=target_seq_len),
    }
    return params


def convert_avclip_checkpoint(ckpt: Mapping) -> Dict:
    """Stage I checkpoint ({'state_dict': sd}) -> AVCLIP params tree. Tower
    keys carry a_encoder./v_encoder. (optionally module.) prefixes
    (ref: ast.py:118-122, motionformer.py:159-163)."""
    sd = ckpt.get("state_dict", ckpt)
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    a_sd = _strip_prefixes(sd, ["a_encoder."])
    v_sd = _strip_prefixes(sd, ["v_encoder."])
    params: Dict[str, Any] = {
        "v_encoder": convert_motionformer(v_sd),
        "a_encoder": convert_ast(a_sd),
    }
    if "logit_scale" in sd:
        params["logit_scale"] = _np(sd["logit_scale"]).reshape(())
    return params


def extract_tower_from_avclip(ckpt: Mapping, tower: str) -> Dict:
    """Initialize one tower from a Stage-I ckpt (cross-stage surgery,
    ref: ast.py:113-132 / motionformer.py:156-173)."""
    sd = ckpt.get("state_dict", ckpt)
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    if tower == "audio":
        return convert_ast(_strip_prefixes(sd, ["a_encoder."]))
    if tower == "visual":
        return convert_motionformer(_strip_prefixes(sd, ["v_encoder."]))
    raise ValueError(tower)


def load_stage1_tower(ckpt_path: str, tower: str) -> Dict:
    """Load one tower's params from a Stage-I checkpoint, torch OR
    framework-native orbax (the cross-stage surgery of ref: ast.py:113-132,
    motionformer.py:156-173, extended to this framework's own Stage-I runs).

    Accepted paths:
    - ``*.pt``            — reference torch AVCLIP ckpt (converted)
    - an orbax run dir    — a Stage-I exp dir (``<dir>/ckpts/{best,latest}``),
      its ``ckpts`` dir, or a direct ``best``/``latest`` manager dir; restores
      best when available, else latest, and slices the tower subtree (already
      in flax layout — no conversion).

    Raises on anything that cannot be loaded — a configured-but-unloaded
    tower must fail loudly, not waste a training run.
    """
    import jax

    assert tower in ("audio", "visual"), tower
    path = Path(ckpt_path)
    if not path.exists():
        raise FileNotFoundError(
            f"{tower} tower ckpt_path does not exist: {ckpt_path}")
    if path.is_file():
        if path.suffix not in (".pt", ".pth", ".pyth"):
            raise ValueError(
                f"{tower} tower ckpt_path is a file but not a torch ckpt: {ckpt_path}")
        return extract_tower_from_avclip(load_torch_checkpoint(str(path)), tower)

    # orbax run dir: resolve to the dir that holds best/ and/or latest/
    for candidate in (path, path / "ckpts"):
        if (candidate / "best").is_dir() or (candidate / "latest").is_dir():
            ckpts_dir = candidate
            break
    else:
        if path.name in ("best", "latest"):
            ckpts_dir = path.parent
        else:
            raise FileNotFoundError(
                f"{tower} tower ckpt_path {ckpt_path} is a directory but holds "
                "no orbax 'best'/'latest' checkpoints")
    mngr = CheckpointManager(str(ckpts_dir))
    if mngr.best_step() is not None:
        payload = mngr.restore_best()
    elif mngr.latest_step() is not None:
        payload = mngr.restore_latest()
    else:
        raise FileNotFoundError(f"no orbax checkpoint steps under {ckpts_dir}")
    params = payload.get("trainable", payload.get("params", payload))
    enc_key = "a_encoder" if tower == "audio" else "v_encoder"
    if enc_key not in params:
        raise KeyError(
            f"orbax ckpt under {ckpts_dir} has no '{enc_key}' subtree "
            f"(keys: {sorted(params)[:8]}) — is it a Stage-I run?")
    return jax.tree.map(np.asarray, params[enc_key])


def trim_sync_pos_emb(params: Mapping, target_seq_len: Optional[int]) -> Dict:
    """Apply the reference's pos-emb trim rule to an already-converted params
    tree (ref: model/sync_model.py:101-114): trim a longer checkpoint pos emb
    to the current model's sequence length, refuse a shorter one."""
    if target_seq_len is None:
        return dict(params)
    st = params.get("sync_transformer", params)
    pos_cfg = st.get("pos_emb")
    if not pos_cfg or "pos_emb" not in pos_cfg:
        return dict(params)
    pos = np.asarray(pos_cfg["pos_emb"])
    if pos.shape[1] > target_seq_len:
        logging.warning(f"trimming sync pos emb {pos.shape[1]} -> {target_seq_len}")
        pos = pos[:, :target_seq_len]
    elif pos.shape[1] < target_seq_len:
        raise ValueError(
            f"cannot load shorter pos emb ({pos.shape[1]} < {target_seq_len})")
    new_st = {**st, "pos_emb": {**pos_cfg, "pos_emb": pos}}
    if "sync_transformer" in params:
        return {**params, "sync_transformer": new_st}
    return new_st


def merge_params_nonstrict(init_params: Mapping, loaded: Mapping,
                           _path: str = "") -> tuple:
    """torch's ``load_state_dict(strict=False)`` for nested param trees
    (ref: scripts/train_sync.py:68-99, train_utils.py:251-265).

    Keys present in both trees with matching shapes take the loaded value;
    model-only keys keep their fresh initialization (``missing``, e.g. the
    2-class sync_head during Stage-III finetuning); ckpt-only keys are
    dropped (``unexpected``); shape mismatches keep the fresh value and are
    reported (``mismatched``).
    """
    report = {"missing": [], "unexpected": [], "mismatched": []}
    merged: Dict[str, Any] = {}
    for key, init_val in init_params.items():
        path = f"{_path}{key}"
        if key not in loaded:
            report["missing"].append(path)
            merged[key] = init_val
        elif isinstance(init_val, Mapping):
            sub, sub_report = merge_params_nonstrict(init_val, loaded[key],
                                                     _path=path + ".")
            merged[key] = sub
            for field in report:
                report[field].extend(sub_report[field])
        else:
            new_val = loaded[key]
            if np.shape(new_val) != np.shape(init_val):
                report["mismatched"].append(
                    f"{path}: ckpt {np.shape(new_val)} vs model {np.shape(init_val)}")
                merged[key] = init_val
            else:
                merged[key] = new_val
    for key in loaded:
        if key not in init_params:
            report["unexpected"].append(f"{_path}{key}")
    return merged, report


_STUB_CACHE: Dict = {}


def _make_stub(module: str, name: str):
    """A shape-only stand-in for an unimportable pickled class: captures the
    pickled state so plain_from_ckpt_args can walk it."""
    cls = _STUB_CACHE.get((module, name))
    if cls is None:
        def _setstate(self, state):
            self.__dict__.update(state if isinstance(state, dict)
                                 else {"_state": state})

        cls = type(name, (), {"__module__": module, "__setstate__": _setstate})
        _STUB_CACHE[(module, name)] = cls
    return cls


def load_torch_checkpoint(path: str) -> Dict:
    """torch.load a reference .pt/.pyth file (CPU, weights only when possible).

    Published reference checkpoints embed their training config as a pickled
    omegaconf DictConfig under ``ckpt['args']`` (ref: train_utils.py:253).
    omegaconf is not a dependency here, so the weights_only=False fallback
    unpickles unimportable ``omegaconf.*`` classes into inert stubs;
    plain_from_ckpt_args recovers the config dict from them.
    """
    import pickle

    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        pass

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                if module.split(".")[0] == "omegaconf":
                    return _make_stub(module, name)
                raise

    class _PickleModule:
        Unpickler = _Unpickler
        load = staticmethod(pickle.load)

    return torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_PickleModule)


def plain_from_ckpt_args(obj) -> Any:
    """Best-effort ``ckpt['args']`` -> plain python containers.

    Handles plain dicts (framework-native ckpts) and pickled omegaconf
    DictConfig/ListConfig/ValueNode trees (reference ckpts, unpickled as stubs
    by load_torch_checkpoint): containers keep ``_content``, value nodes keep
    ``_val``; omegaconf's mandatory-missing marker '???' maps to None.
    """
    if isinstance(obj, Mapping):
        return {k: plain_from_ckpt_args(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [plain_from_ckpt_args(v) for v in obj]
    d = getattr(obj, "__dict__", None)
    if isinstance(d, dict):
        if "_content" in d:
            return plain_from_ckpt_args(d["_content"])
        if "_val" in d:
            return plain_from_ckpt_args(d["_val"])
    if isinstance(obj, str) and obj == "???":
        return None
    return obj


# ---------------------------------------------------------------------------
# orbax-native checkpoint IO
# ---------------------------------------------------------------------------

class CheckpointManager:
    """best + latest checkpointing with orbax (atomic by construction).

    Mirrors the reference's two-file cadence (ref: utils/logger.py:139-160,
    scripts/train_sync.py:257-267): ``save_latest`` after every training
    epoch for crash-resume, ``save_best`` when the early-stop metric
    improves. Two orbax managers over ``<dir>/latest`` and ``<dir>/best``;
    each save is atomic (tmp dir + rename inside orbax — the reference
    hand-rolls tmp->os.replace, ref: train_clip.py:425-441).
    """

    def __init__(self, directory: str, max_to_keep: int = 2):
        import orbax.checkpoint as ocp

        self._dir = Path(directory).absolute()
        self._ocp = ocp
        opts = dict(create=True, max_to_keep=max_to_keep)
        self._latest = ocp.CheckpointManager(
            self._dir / "latest", options=ocp.CheckpointManagerOptions(**opts))
        self._best = ocp.CheckpointManager(
            self._dir / "best",
            options=ocp.CheckpointManagerOptions(
                best_fn=lambda m: m.get("best_metric", 0.0), **opts))

    def _save(self, mngr, step: int, payload: Dict[str, Any],
              metrics: Optional[Dict[str, float]]) -> None:
        mngr.save(step, args=self._ocp.args.StandardSave(payload),
                  metrics=metrics or {})
        mngr.wait_until_finished()

    def save_latest(self, step: int, payload: Dict[str, Any],
                    metrics: Optional[Dict[str, float]] = None) -> None:
        self._save(self._latest, step, payload, metrics)

    def save_best(self, step: int, payload: Dict[str, Any],
                  metrics: Optional[Dict[str, float]] = None) -> None:
        self._save(self._best, step, payload, metrics)

    def _restore(self, mngr, step: Optional[int], template) -> Dict[str, Any]:
        step = mngr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self._dir}")
        if template is not None:
            return mngr.restore(step, args=self._ocp.args.StandardRestore(template))
        return mngr.restore(step)

    def restore_latest(self, step: Optional[int] = None,
                       template: Optional[Any] = None) -> Dict[str, Any]:
        return self._restore(self._latest, step, template)

    def restore_best(self, step: Optional[int] = None,
                     template: Optional[Any] = None) -> Dict[str, Any]:
        return self._restore(self._best, step, template)

    def latest_step(self) -> Optional[int]:
        return self._latest.latest_step()

    def best_step(self) -> Optional[int]:
        return self._best.best_step()
