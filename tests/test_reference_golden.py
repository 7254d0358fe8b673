"""Golden parity tests against the REFERENCE'S OWN torch modules.

Every other parity test in this suite compares against stock HF/torch
primitives or this repo's own re-derivations. These tests import the actual
reference code from /root/reference (via tests/refshim.py), randomize its
weights, convert the torch state dict with synchformer_tpu.utils.checkpoint,
and assert fp32 activation/logit parity between the reference forward pass
and the flax forward pass, at four levels:

1. DividedAttention (space + time modes, with and without token masks)
   vs ref: motionformer_src/vit_helper.py:80-158
2. DividedSpaceTimeBlock vs ref: vit_helper.py:332-376
3. Full MotionFormer tower (trunk + spatial agg) vs
   ref: visual/motionformer.py:182-272 + video_model_builder.py:174-274
   (tiny dims fast; full ViT-B marked slow)
4. Full AST tower vs ref: audio/ast.py:137-279 (real dims: 12 layers, D=768)
5. GlobalTransformer (+syncability head) vs ref: model/sync_model.py:117-190
6. Full Synchformer logits+loss vs ref: model/sync_model.py:38-99 (slow)
7. Stage-I contrastive losses (AVCLIP divisor-temperature InfoNCE; MoCo
   queue negatives + ALBEF soft targets) vs ref: open_clip/model.py:507-531,
   694-721
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from synchformer_tpu.utils import checkpoint as ckpt_lib

import tests.refshim as refshim

refshim.install()


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def randomize_(module: torch.nn.Module, seed: int = 0, scale: float = 0.02):
    """Give every parameter healthy random values (the reference zero-inits
    several tensors — patch_embed_3d, DividedAttention qkv — which would make
    a parity test vacuous). 1-D `.weight` tensors are LayerNorm/BatchNorm
    scales: keep them near 1 so activations don't collapse."""
    gen = torch.Generator().manual_seed(seed)
    for name, p in module.named_parameters():
        with torch.no_grad():
            if name.endswith(".weight") and p.ndim == 1:
                p.copy_(1.0 + 0.05 * torch.randn(p.shape, generator=gen))
            else:
                p.copy_(scale * torch.randn(p.shape, generator=gen))


def np_sd(module: torch.nn.Module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def t2n(t) -> np.ndarray:
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# 1. DividedAttention
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["space", "time"])
@pytest.mark.parametrize("masked", [False, True])
def test_divided_attention_golden(mode, masked, rng):
    vit_helper = refshim.load_ref_module("motionformer_src.vit_helper")
    from synchformer_tpu.models.motionformer import DividedAttention

    d, h, f, n, b = 48, 4, 3, 6, 2
    seq = 1 + f * n

    ref = vit_helper.DividedAttention(dim=d, num_heads=h, qkv_bias=True)
    randomize_(ref, seed=1)
    ref.eval()

    x = rng.standard_normal((b, seq, d)).astype(np.float32)
    keep = None
    tok_mask = None
    if masked:
        keep = rng.random((b, seq)) > 0.3
        keep[:, 0] = True  # CLS always kept (as the reference plumbing does)
        tok_mask = torch.from_numpy(keep)

    with torch.no_grad():
        if mode == "space":
            ref_out = ref(torch.from_numpy(x), "b (f n) d", "(b f) n d", f=f,
                          tok_mask=tok_mask)
        else:
            ref_out = ref(torch.from_numpy(x), "b (f n) d", "(b n) f d", n=n,
                          tok_mask=tok_mask)

    sd = np_sd(ref)
    params = {
        "qkv": ckpt_lib._fused_qkv_from_packed(sd, "qkv"),
        "proj": ckpt_lib._linear(sd, "proj"),
    }
    mod = DividedAttention(num_heads=h)
    got = mod.apply({"params": params}, jnp.asarray(x), num_frames=f, mode=mode,
                    keep_mask=None if keep is None else jnp.asarray(keep))
    np.testing.assert_allclose(np.asarray(got), t2n(ref_out), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# 2. DividedSpaceTimeBlock
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("masked", [False, True])
def test_divided_block_golden(masked, rng):
    vit_helper = refshim.load_ref_module("motionformer_src.vit_helper")
    from synchformer_tpu.models.motionformer import DividedSpaceTimeBlock

    d, h, f, n, b = 48, 4, 2, 9, 2
    seq = 1 + f * n

    ref = vit_helper.DividedSpaceTimeBlock(dim=d, num_heads=h, qkv_bias=True,
                                           mlp_ratio=4.0)
    randomize_(ref, seed=2)
    ref.eval()

    x = rng.standard_normal((b, seq, d)).astype(np.float32)
    keep = None
    tok_mask = None
    if masked:
        keep = rng.random((b, seq)) > 0.3
        keep[:, 0] = True
        tok_mask = torch.from_numpy(keep)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), seq_len=n, num_frames=f,
                      tok_mask=tok_mask)

    sd = np_sd(ref)
    params = {
        "norm1": ckpt_lib._layernorm(sd, "norm1"),
        "norm2": ckpt_lib._layernorm(sd, "norm2"),
        "norm3": ckpt_lib._layernorm(sd, "norm3"),
        "attn": {"qkv": ckpt_lib._fused_qkv_from_packed(sd, "attn.qkv"),
                 "proj": ckpt_lib._linear(sd, "attn.proj")},
        "timeattn": {"qkv": ckpt_lib._fused_qkv_from_packed(sd, "timeattn.qkv"),
                     "proj": ckpt_lib._linear(sd, "timeattn.proj")},
        "mlp": {"fc1": ckpt_lib._linear(sd, "mlp.fc1"),
                "fc2": ckpt_lib._linear(sd, "mlp.fc2")},
    }
    mod = DividedSpaceTimeBlock(num_heads=h, num_frames=f)
    got = mod.apply({"params": params}, jnp.asarray(x),
                    None if keep is None else jnp.asarray(keep))
    np.testing.assert_allclose(np.asarray(got), t2n(ref_out), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# 3. MotionFormer tower (wrapper: trunk + norm + spatial agg, Identity time agg)
# ---------------------------------------------------------------------------

def _build_ref_motionformer(depth=None, embed_dim=None, num_heads=None):
    """Construct the reference MotionFormer wrapper (divided config), with an
    optional tiny override of depth/width for the fast test."""
    mf_mod = refshim.load_ref_module(
        "model.modules.feat_extractors.visual.motionformer")
    omegaconf = refshim.sys.modules["omegaconf"]
    orig_load = omegaconf.OmegaConf.load

    def patched_load(path):
        cfg = orig_load(path)
        if depth is not None:
            cfg.VIT.DEPTH = depth
        if embed_dim is not None:
            cfg.VIT.EMBED_DIM = embed_dim
        if num_heads is not None:
            cfg.VIT.NUM_HEADS = num_heads
        return cfg

    omegaconf.OmegaConf.load = staticmethod(patched_load)
    try:
        ref = mf_mod.MotionFormer(
            ckpt_path=None, extract_features=True, factorize_space_time=True,
            agg_space_module="TransformerEncoderLayer",
            agg_time_module="torch.nn.Identity", add_global_repr=False)
    finally:
        omegaconf.OmegaConf.load = staticmethod(orig_load)
    return ref


def _motionformer_parity(depth, embed_dim, num_heads, b, s, rng,
                         rtol, atol):
    from synchformer_tpu.models.motionformer import MotionFormerEncoder

    ref = _build_ref_motionformer(depth=depth, embed_dim=embed_dim,
                                  num_heads=num_heads)
    randomize_(ref, seed=3)
    ref.eval()

    vis = rng.standard_normal((b, s, 3, 16, 224, 224)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_out, ref_global = ref(torch.from_numpy(vis))
    assert ref_global is None

    params = ckpt_lib.convert_motionformer(np_sd(ref))
    overrides = {k: v for k, v in
                 dict(embed_dim=embed_dim, depth=depth, num_heads=num_heads).items()
                 if v is not None}
    mod = MotionFormerEncoder(**overrides)
    vis_cl = np.transpose(vis, (0, 1, 3, 4, 5, 2))  # (B,S,T,H,W,C)
    got, got_global = mod.apply({"params": params}, jnp.asarray(vis_cl))
    assert got_global is None
    np.testing.assert_allclose(np.asarray(got), t2n(ref_out), rtol=rtol, atol=atol)


def test_motionformer_tower_golden_tiny(rng):
    """Tiny-dims tower: depth 2, D=96 — full pipeline parity in seconds."""
    _motionformer_parity(depth=2, embed_dim=96, num_heads=4, b=1, s=2, rng=rng,
                         rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_motionformer_tower_golden_vitb(rng):
    """Full ViT-B tower (depth 12, D=768) vs the reference's own code."""
    _motionformer_parity(depth=None, embed_dim=None, num_heads=None, b=1, s=1,
                         rng=rng, rtol=1e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# 4. AST tower (real dims)
# ---------------------------------------------------------------------------

def test_ast_tower_golden(rng):
    ast_mod = refshim.load_ref_module("model.modules.feat_extractors.audio.ast")
    from synchformer_tpu.models.ast_encoder import ASTEncoder

    ref = ast_mod.AST(extract_features=True, ckpt_path=None, max_spec_t=66,
                      factorize_freq_time=True,
                      agg_freq_module="TransformerEncoderLayer",
                      agg_time_module="torch.nn.Identity",
                      add_global_repr=False)
    randomize_(ref, seed=4)
    ref.eval()

    b, s = 1, 2
    aud = rng.standard_normal((b, s, 66, 128)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_global = ref(torch.from_numpy(aud))
    assert ref_global is None

    params = ckpt_lib.convert_ast(np_sd(ref), max_patches=None)
    mod = ASTEncoder()
    got, got_global = mod.apply({"params": params}, jnp.asarray(aud))
    assert got_global is None
    np.testing.assert_allclose(np.asarray(got), t2n(ref_out), rtol=1e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# 5. GlobalTransformer (+ syncability head)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("syncability", [False, True])
def test_global_transformer_golden(syncability, rng):
    sm = refshim.load_ref_module("model.sync_model")
    from synchformer_tpu.models.sync_model import (
        GlobalTransformer,
        GlobalTransformerWithSyncabilityHead,
    )

    d, heads, layers, s = 64, 4, 2, 2
    sv, sa = s * 8, s * 6
    seq = 2 + sv + sa

    common = dict(
        tok_pdrop=0.0, embd_pdrop=0.1, resid_pdrop=0.1, attn_pdrop=0.1,
        n_layer=layers, n_head=heads, n_embd=d,
        pos_emb_cfg={"target": "model.modules.transformer.RandInitPositionalEncoding",
                     "params": {"block_shape": [seq], "n_embd": d}},
        off_head_cfg={"target": "torch.nn.Linear",
                      "params": {"in_features": d, "out_features": 21}},
    )
    ref_cls = (sm.GlobalTransformerWithSyncabilityHead if syncability
               else sm.GlobalTransformer)
    ref = ref_cls(**common)
    randomize_(ref, seed=5)
    ref.eval()

    v = rng.standard_normal((2, sv, d)).astype(np.float32)
    a = rng.standard_normal((2, sa, d)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(v), torch.from_numpy(a))

    params = ckpt_lib.convert_global_transformer(np_sd(ref), prefix="",
                                                 n_layer=layers)
    my_cls = (GlobalTransformerWithSyncabilityHead if syncability
              else GlobalTransformer)
    mod = my_cls(
        n_layer=layers, n_head=heads, n_embd=d,
        pos_emb_cfg={"target": "synchformer_tpu.models.pos_emb.RandInitPositionalEncoding",
                     "params": {"block_shape": [seq], "n_embd": d}},
        off_head_cfg={"target": "torch.nn.Linear",
                      "params": {"in_features": d, "out_features": 21}},
    )
    got = mod.apply({"params": params}, jnp.asarray(v), jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(got), t2n(ref_out), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# 6. Full Synchformer (real dims, S=2 segments)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_synchformer_full_golden(rng):
    sm = refshim.load_ref_module("model.sync_model")
    from synchformer_tpu.models import presets
    from synchformer_tpu.models.sync_model import Synchformer

    s = 2
    seq = 2 + s * 8 + s * 6

    ref = sm.Synchformer(
        afeat_extractor={
            "target": "model.modules.feat_extractors.audio.ast.AST",
            "params": dict(ckpt_path=None, extract_features=True, max_spec_t=66,
                           factorize_freq_time=True,
                           agg_freq_module="TransformerEncoderLayer",
                           agg_time_module="torch.nn.Identity",
                           add_global_repr=False)},
        vfeat_extractor={
            "target": "model.modules.feat_extractors.visual.motionformer.MotionFormer",
            "params": dict(ckpt_path=None, extract_features=True,
                           factorize_space_time=True,
                           agg_space_module="TransformerEncoderLayer",
                           agg_time_module="torch.nn.Identity",
                           add_global_repr=False)},
        aproj={"target": "torch.nn.Linear",
               "params": {"in_features": 768, "out_features": 768}},
        vproj={"target": "torch.nn.Linear",
               "params": {"in_features": 768, "out_features": 768}},
        transformer={
            "target": "model.sync_model.GlobalTransformer",
            "params": dict(
                n_layer=3, n_head=8, n_embd=768, tok_pdrop=0.0, embd_pdrop=0.1,
                resid_pdrop=0.1, attn_pdrop=0.1,
                pos_emb_cfg={"target": "model.modules.transformer.RandInitPositionalEncoding",
                             "params": {"block_shape": [seq], "n_embd": 768}},
                off_head_cfg={"target": "torch.nn.Linear",
                              "params": {"in_features": 768, "out_features": 21}})},
    )
    randomize_(ref, seed=6)
    ref.eval()

    vis = rng.standard_normal((1, s, 16, 3, 224, 224)).astype(np.float32) * 0.5
    aud = rng.standard_normal((1, s, 1, 128, 66)).astype(np.float32)
    targets = np.array([7], dtype=np.int64)
    with torch.no_grad():
        ref_loss, ref_logits = ref(torch.from_numpy(vis), torch.from_numpy(aud),
                                   targets=torch.from_numpy(targets))

    params = ckpt_lib.convert_sync_checkpoint({"model": np_sd(ref)})
    mod = Synchformer(
        afeat_extractor=presets.ast_cfg(),
        vfeat_extractor=presets.motionformer_cfg(),
        aproj=presets.linear_proj_cfg(),
        vproj=presets.linear_proj_cfg(),
        transformer=presets.global_transformer_cfg(n_segments=s),
    )
    vis_cl = np.transpose(vis, (0, 1, 2, 4, 5, 3))  # (B,S,T,H,W,C)
    aud_tf = np.transpose(aud[:, :, 0], (0, 1, 3, 2))  # (B,S,T,F)
    loss, logits = mod.apply({"params": params}, jnp.asarray(vis_cl),
                             jnp.asarray(aud_tf), targets=jnp.asarray(targets))

    np.testing.assert_allclose(np.asarray(logits), t2n(ref_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)


# ---------------------------------------------------------------------------
# 7. Stage-I contrastive losses vs the reference's own open_clip/model.py
# ---------------------------------------------------------------------------

def _load_ref_open_clip_model():
    """Import the reference's open_clip/model.py under a synthetic package so
    its relative imports resolve WITHOUT executing open_clip/__init__.py
    (which drags in CoCa / HF-hub / tokenizer surfaces irrelevant here)."""
    import importlib
    import importlib.machinery
    import sys
    import types

    if "open_clip.model" in sys.modules:
        return sys.modules["open_clip.model"]
    ocdir = (refshim.REF_ROOT / "model" / "modules" / "feat_extractors"
             / "train_clip_src" / "open_clip")
    # the package must be registered under its real name ("open_clip"):
    # modified_resnet.py etc. use absolute `open_clip.*` imports internally
    pkg = types.ModuleType("open_clip")
    pkg.__path__ = [str(ocdir)]
    spec = importlib.machinery.ModuleSpec("open_clip", None, is_package=True)
    spec.submodule_search_locations = [str(ocdir)]
    pkg.__spec__ = spec
    sys.modules["open_clip"] = pkg
    return importlib.import_module("open_clip.model")


def _unit_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_avclip_contrastive_loss_golden(rng):
    """AVCLIP loss (divisor temperature, symmetric CE, eye targets) vs
    ref: open_clip/model.py:507-531 run verbatim in torch fp32. The loss
    methods are stateless, so the reference object is built without towers."""
    ref = _load_ref_open_clip_model()
    n, d, scale = 24, 32, 0.07
    v, a = _unit_rows(rng, n, d), _unit_rows(rng, n, d)
    obj = ref.AVCLIP.__new__(ref.AVCLIP)
    ref_loss, (ref_sim_v2a, _) = obj.compute_loss(
        torch.from_numpy(v), torch.from_numpy(a),
        torch.from_numpy(v).mT, torch.from_numpy(a).mT, torch.tensor(scale))

    from synchformer_tpu.models.avclip import AVCLIP

    model = AVCLIP(n_embd=d, afeat_extractor={}, vfeat_extractor={},
                   aproj={}, vproj={})  # unbound: loss uses no params
    got = model.contrastive_loss(jnp.asarray(v), jnp.asarray(a),
                                 jnp.asarray(v), jnp.asarray(a),
                                 jnp.asarray(scale))
    np.testing.assert_allclose(float(got), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    # the logging similarity matrix is the same divisor-temperature formula
    np.testing.assert_allclose(np.asarray(v @ a.T / scale, dtype=np.float32),
                               t2n(ref_sim_v2a), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("alpha", [0.0, 0.4])
def test_moco_contrastive_loss_golden(alpha, rng):
    """MoCo loss vs [momentum keys | queue] negatives, incl. the ALBEF
    soft-target interpolation, vs ref: open_clip/model.py:694-721."""
    ref = _load_ref_open_clip_model()
    n, q, d, scale = 8, 16, 32, 0.05
    v, a = _unit_rows(rng, n, d), _unit_rows(rng, n, d)
    vm, am = _unit_rows(rng, n, d), _unit_rows(rng, n, d)
    vq, aq = _unit_rows(rng, q, d), _unit_rows(rng, q, d)
    v_all = np.concatenate([vm, vq], 0).T  # (D, B+Q), as the reference cats
    a_all = np.concatenate([am, aq], 0).T

    obj = ref.MultilevelMoCoCLIP.__new__(ref.MultilevelMoCoCLIP)
    ref_loss, _ = obj.compute_loss(
        torch.from_numpy(v), torch.from_numpy(a),
        torch.from_numpy(v_all), torch.from_numpy(a_all),
        torch.tensor(scale), alpha=alpha,
        vfeat_m=torch.from_numpy(vm), afeat_m=torch.from_numpy(am))

    from synchformer_tpu.models.moco_clip import moco_contrastive_loss

    got = moco_contrastive_loss(
        jnp.asarray(v), jnp.asarray(a), jnp.asarray(v_all),
        jnp.asarray(a_all), jnp.asarray(scale), alpha=alpha,
        vfeat_m=jnp.asarray(vm), afeat_m=jnp.asarray(am))
    np.testing.assert_allclose(float(got), float(ref_loss),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# 8. calc_cls_metrics vs the reference's own scripts/train_utils.py:632-742
#    (sklearn is installed, so the reference metric code runs verbatim)
# ---------------------------------------------------------------------------

def _load_ref_train_utils():
    import importlib.util
    import sys

    if "ref_train_utils" in sys.modules:
        return sys.modules["ref_train_utils"]
    refshim.install()
    spec = importlib.util.spec_from_file_location(
        "ref_train_utils", str(refshim.REF_ROOT / "scripts" / "train_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_train_utils"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("case", ["multiclass", "prefix", "binary", "doubt",
                                  "only_acc", "missing"])
def test_calc_cls_metrics_golden(case, rng):
    """Metric-for-metric equality with the reference's calc_cls_metrics on
    identical inputs: accuracy@k (incl. the binary positive-score path),
    ±1-tolerance accuracy (incl. doubt-class exclusion), one-vs-rest
    mAP/mROCAUC/d-prime, missing-class dummy values, P/R/F1, and the
    fix_prefix underscore convention."""
    tu = _load_ref_train_utils()
    from synchformer_tpu.train.metrics import calc_cls_metrics

    n, c = 400, 21
    kwargs = dict(topk=(1, 5))
    if case == "binary":
        c = 2
        kwargs = dict(topk=(1, 5), calc_pr_rec_f1=True)
    elif case == "doubt":
        kwargs = dict(topk=(1, 2), add_doubt_cls=True)
    elif case == "only_acc":
        kwargs = dict(topk=(1,), only_accuracy=True)
    elif case == "prefix":
        kwargs = dict(topk=(1,), prefix="test")

    targets = rng.integers(0, c, n)
    if case != "missing":
        targets[:c] = np.arange(c)  # every class occurs -> real mAP/ROC path
    else:
        targets = np.clip(targets, 0, c - 3)  # top classes absent -> dummies
    logits = rng.standard_normal((n, c)).astype(np.float64)
    logits[np.arange(n), targets] += 1.5  # non-trivial but imperfect model

    ref = tu.calc_cls_metrics(torch.from_numpy(targets).long(),
                              torch.from_numpy(logits).float(),
                              verbose=False, **kwargs)
    got = calc_cls_metrics(targets, logits, verbose=False, **kwargs)

    assert set(got) == set(ref), (sorted(got), sorted(ref))
    for key in ref:
        np.testing.assert_allclose(got[key], float(ref[key]), rtol=1e-6,
                                   atol=1e-9, err_msg=key)


# ---------------------------------------------------------------------------
# 9. LR schedules vs the reference's own scheduler code
# ---------------------------------------------------------------------------

def _load_ref_by_path(name, relpath):
    import importlib.util
    import sys

    if name in sys.modules:
        return sys.modules[name]
    refshim.install()
    spec = importlib.util.spec_from_file_location(
        name, str(refshim.REF_ROOT / relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_lr_schedule_golden_stage1():
    """Step-exact lr(s) equality with the Stage-I adjusters
    (ref: training/scheduler.py:13-53), including the (s+1)/warmup ramp."""
    sched = _load_ref_by_path(
        "ref_clip_scheduler",
        "model/modules/feat_extractors/train_clip_src/training/scheduler.py")
    from synchformer_tpu.train.state import make_lr_schedule

    base, warmup, total = 3e-4, 7, 40
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)

    cases = [
        ("cosine", sched.cosine_lr(opt, base, warmup, total),
         make_lr_schedule("cosine", base, warmup, total)),
        ("const", sched.const_lr(opt, base, warmup, total),
         make_lr_schedule("const", base, warmup, total)),
        ("const-cooldown",
         sched.const_lr_cooldown(opt, base, warmup, total, cooldown_steps=10,
                                 cooldown_power=2.0, cooldown_end_lr=1e-5),
         make_lr_schedule("const-cooldown", base, warmup, total,
                          cooldown_steps=10, cooldown_power=2.0,
                          cooldown_end=1e-5)),
    ]
    for label, ref_fn, ours in cases:
        for s in range(total):
            # optax evaluates in f32; the reference in f64 — tail values of
            # the cosine differ in the 6th significant digit
            np.testing.assert_allclose(float(ours(s)), float(ref_fn(s)),
                                       rtol=2e-5, atol=1e-12,
                                       err_msg=f"{label} step {s}")


def test_lr_schedule_golden_constant_with_warmup():
    """Step-exact equality with the Stage-II torch SequentialLR(LinearLR 1/100,
    ConstantLR) built by the reference (ref: scripts/train_utils.py:238-248)."""
    tu = _load_ref_train_utils()
    from synchformer_tpu.train.state import make_lr_schedule

    base, warmup = 3e-4, 7
    cfg = refshim.to_dotdict(
        {"training": {"lr_scheduler": {"name": "constant_with_warmup",
                                       "warmup": warmup}}})
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    ref_sched = tu.get_lr_scheduler(cfg, opt)
    ours = make_lr_schedule("constant_with_warmup", base, warmup)
    for s in range(25):
        ref_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(ours(s)), ref_lr, rtol=2e-5,
                                   atol=1e-12, err_msg=f"step {s}")
        ref_sched.step()


# ---------------------------------------------------------------------------
# 10. EarlyStopper decision parity vs ref scripts/train_utils.py:293-327
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("to_max", [True, False])
def test_early_stopper_golden(to_max):
    """Decision-for-decision equality with the reference stopper, including
    the 0.0 (not -inf) starting best for to_max metrics."""
    tu = _load_ref_train_utils()
    from synchformer_tpu.utils.logger import EarlyStopper

    seq = [0.0, 0.1, 0.2, 0.2, 0.15, 0.3, 0.3, 0.25, 0.25, 0.25]
    if not to_max:
        seq = [1.0 - v for v in seq]
    ref = tu.EarlyStopper(patience=2, to_max=to_max, metric_name="m")
    ours = EarlyStopper(patience=2, to_max=to_max)
    for v in seq:
        metrics = {"m": v}
        ref_better = ref.is_new_model_better_than_curr(metrics)
        if ref_better:
            ref.reset_patience(0, metrics)
        else:
            ref.increment_patience(0)
        assert ours.update(v) == ref_better, v
        assert ours.best == pytest.approx(ref.best_metric)
        assert ours.count == ref.no_change_epochs
        assert ours.triggered == ref.triggered


def test_per_class_accuracy_golden(rng):
    """Our per-class accuracy equals the reference's per-offset-class
    accuracy_1 from calc_performance_per_class (ref: train_utils.py:566-600)."""
    tu = _load_ref_train_utils()
    from synchformer_tpu.train.metrics import per_class_accuracy

    n, c = 200, 7
    targets = rng.integers(0, c, n)
    targets[:c] = np.arange(c)
    logits = rng.standard_normal((n, c)).astype(np.float32)
    logits[np.arange(n), targets] += 1.0

    target2label = {i: f"lab{i}" for i in range(c)}
    ref = tu.calc_performance_per_class(
        target2label, "off", torch.from_numpy(logits),
        torch.from_numpy(targets).long())
    got = per_class_accuracy(targets, logits)
    for i in range(c):
        np.testing.assert_allclose(got[i], float(ref[f"lab{i}"]["accuracy_1"]),
                                   atol=1e-9, err_msg=f"class {i}")
