"""Shape and math tests for the tower/sync models (tiny configs, CPU).

Mirrors the reference's smoke-block strategy (SURVEY.md §4) but as real
asserts, plus an exact parity test of the divided space-time attention
pattern against a brute-force masked dense attention.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synchformer_tpu.models.ast_encoder import ASTEncoder
from synchformer_tpu.models.motionformer import DividedAttention, MotionFormerEncoder
from synchformer_tpu.models.sync_model import (
    GlobalTransformer,
    GlobalTransformerWithSyncabilityHead,
    Synchformer,
)
from synchformer_tpu.models.avclip import AVCLIP

D = 32
HEADS = 4

TINY_VIS = dict(
    target="synchformer_tpu.models.motionformer.MotionFormerEncoder",
    params=dict(embed_dim=D, depth=2, num_heads=HEADS, patch_size=8, z_block_size=2,
                temporal_resolution=2, img_size=16, drop_path_rate=0.0),
)
TINY_AUD = dict(
    target="synchformer_tpu.models.ast_encoder.ASTEncoder",
    params=dict(hidden_size=D, depth=2, num_heads=HEADS, patch_size=8,
                frequency_stride=6, time_stride=6, num_mel_bins=20, max_spec_t=14),
)
TINY_PROJ = dict(target="torch.nn.Linear", params=dict(in_features=D, out_features=D))
TINY_TRANSFORMER = dict(
    target="synchformer_tpu.models.sync_model.GlobalTransformer",
    params=dict(
        n_layer=2, n_head=HEADS, n_embd=D, tok_pdrop=0.0, embd_pdrop=0.1,
        resid_pdrop=0.1, attn_pdrop=0.1,
        pos_emb_cfg=dict(
            target="synchformer_tpu.models.pos_emb.RandInitPositionalEncoding",
            params=dict(block_shape=[14], n_embd=D)),
        off_head_cfg=dict(target="torch.nn.Linear",
                          params=dict(in_features=D, out_features=21)),
    ),
)


def _divided_attention_bruteforce(x, params, num_frames, mode, num_heads):
    """O(N^2) masked dense attention implementing the divided pattern."""
    wqkv = np.asarray(params["qkv"]["kernel"])  # (D, 3D)
    bqkv = np.asarray(params["qkv"]["bias"])
    wproj = np.asarray(params["proj"]["kernel"])
    bproj = np.asarray(params["proj"]["bias"])
    b, seq, d = x.shape
    f = num_frames
    n = (seq - 1) // f
    dh = d // num_heads

    qkv = x @ wqkv + bqkv
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, seq, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q) * dh ** -0.5, heads(k), heads(v)

    # allowed[i, j]: query i may attend key j
    allowed = np.zeros((seq, seq), dtype=bool)
    allowed[0, :] = True  # CLS attends everywhere
    for i in range(1, seq):
        fi, ni = divmod(i - 1, n)
        allowed[i, 0] = True  # CLS key joins every group
        for j in range(1, seq):
            fj, nj = divmod(j - 1, n)
            if mode == "space":
                allowed[i, j] = fi == fj
            else:
                allowed[i, j] = ni == nj

    logits = q @ k.transpose(0, 1, 3, 2)
    logits = np.where(allowed[None, None], logits, -np.inf)
    probs = np.exp(logits - logits.max(axis=-1, keepdims=True))
    probs = probs / probs.sum(axis=-1, keepdims=True)
    out = probs @ v
    out = out.transpose(0, 2, 1, 3).reshape(b, seq, d)
    return out @ wproj + bproj


@pytest.mark.parametrize("mode", ["space", "time"])
def test_divided_attention_matches_masked_dense(rng, mode):
    f, n = 3, 4
    seq = 1 + f * n
    x = rng.standard_normal((2, seq, D)).astype(np.float32)
    attn = DividedAttention(num_heads=HEADS)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x), f, mode)
    # non-degenerate params (flax default init is fine, but randomize bias too)
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(1).standard_normal(p.shape).astype(p.dtype),
        variables["params"])
    out = attn.apply({"params": params}, jnp.asarray(x), f, mode)
    golden = _divided_attention_bruteforce(x, params, f, mode, HEADS)
    np.testing.assert_allclose(np.asarray(out), golden, rtol=2e-4, atol=2e-5)


def test_motionformer_tiny_shapes(rng):
    model = MotionFormerEncoder(**TINY_VIS["params"])
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 16, 16, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats, global_feats = model.apply(variables, x)
    assert feats.shape == (2, 3, 2, D)  # (B, S, t, D), t = 4 frames / z_block 2
    assert global_feats is None


def test_motionformer_global_repr(rng):
    params = dict(TINY_VIS["params"], agg_time_module="AveragePooling",
                  add_global_repr=True, max_segments=3)
    model = MotionFormerEncoder(**params)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 16, 16, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats, global_feats = model.apply(variables, x)
    assert feats.shape == (2, 3, D)
    assert global_feats.shape == (2, D)


def test_ast_tiny_shapes(rng):
    model = ASTEncoder(**TINY_AUD["params"])
    x = jnp.asarray(rng.standard_normal((2, 3, 14, 20)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats, global_feats = model.apply(variables, x)
    assert feats.shape == (2, 3, 2, D)  # t = (14-8)//6+1 = 2
    assert global_feats is None


def test_ast_token_mask_from_content_mask(rng):
    """A token is masked iff its patch window overlaps masked content."""
    model = ASTEncoder(**TINY_AUD["params"])
    x = jnp.asarray(rng.standard_normal((1, 1, 14, 20)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    # mask out the last 6 time steps -> with patch 8 stride 6, the t=1 token
    # (time cells 6..13) overlaps them, the t=0 token (cells 0..7) does too
    # (cells 8..13 masked means t=0 window 0..7 hits masked cell 8? no: 0..7
    #  only — so t=0 stays, t=1 dies)
    mask = np.ones((1, 1, 14, 20), dtype=bool)
    mask[:, :, 8:, :] = False
    out_masked, _ = model.apply(variables, x, keep_mask=jnp.asarray(mask))
    out_full, _ = model.apply(variables, x)
    assert out_masked.shape == out_full.shape
    assert not np.allclose(np.asarray(out_masked), np.asarray(out_full))
    # masking nothing must be a no-op
    out_noop, _ = model.apply(variables, x, keep_mask=jnp.ones_like(jnp.asarray(mask)))
    np.testing.assert_allclose(np.asarray(out_noop), np.asarray(out_full), atol=1e-5)


def test_global_transformer_logits(rng):
    model = GlobalTransformer(**TINY_TRANSFORMER["params"])
    v = jnp.asarray(rng.standard_normal((2, 6, D)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((2, 6, D)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), v, a)
    logits = model.apply(variables, v, a)
    assert logits.shape == (2, 21)
    # train mode needs dropout rng and should differ from eval
    logits_train = model.apply(variables, v, a, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(logits), np.asarray(logits_train))


def test_syncability_head(rng):
    params = dict(TINY_TRANSFORMER["params"])
    model = GlobalTransformerWithSyncabilityHead(**params)
    v = jnp.asarray(rng.standard_normal((2, 6, D)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((2, 6, D)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), v, a)
    logits = model.apply(variables, v, a)
    assert logits.shape == (2, 2)


def test_synchformer_end_to_end_tiny(rng):
    model = Synchformer(
        afeat_extractor=TINY_AUD, vfeat_extractor=TINY_VIS,
        aproj=TINY_PROJ, vproj=TINY_PROJ, transformer=TINY_TRANSFORMER)
    vis = jnp.asarray(rng.standard_normal((2, 3, 4, 16, 16, 3)).astype(np.float32))
    aud = jnp.asarray(rng.standard_normal((2, 3, 14, 20)).astype(np.float32))
    targets = jnp.asarray([3, 18])
    variables = model.init(jax.random.PRNGKey(0), vis, aud)

    @jax.jit
    def fwd(variables, vis, aud, targets):
        return model.apply(variables, vis, aud, targets)

    loss, logits = fwd(variables, vis, aud, targets)
    assert logits.shape == (2, 21)
    assert np.isfinite(float(loss))
    # loss should roughly be ln(21) at init
    assert 1.0 < float(loss) < 6.0


def test_avclip_tiny_loss(rng):
    vis_cfg = dict(TINY_VIS, params=dict(TINY_VIS["params"],
                                         agg_time_module="AveragePooling"))
    aud_cfg = dict(TINY_AUD, params=dict(TINY_AUD["params"],
                                         agg_time_module="AveragePooling"))
    nothing = dict(target="synchformer_tpu.models.bridges.DoNothingBridge", params={})
    model = AVCLIP(n_embd=D, afeat_extractor=aud_cfg, vfeat_extractor=vis_cfg,
                   aproj=nothing, vproj=nothing)
    vis = jnp.asarray(rng.standard_normal((2, 3, 4, 16, 16, 3)).astype(np.float32))
    aud = jnp.asarray(rng.standard_normal((2, 3, 14, 20)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), vis, aud)
    out = model.apply(variables, vis, aud)
    loss = float(out["losses"]["segment_contrastive_loss"])
    assert np.isfinite(loss)
    # 6 in-batch candidates -> CE around ln(6) at init
    assert 0.5 < loss < 4.0
    assert out["rgb_features"][0].shape == (6, D)
    # logit scale is clamped
    assert 0.001 <= float(out["logit_scales"][0]) <= 0.5


def test_preln_block_query_rows_matches_full(rng):
    """CLS-pooling specialization: PreLNBlock(query_rows=1) must equal row 0
    of the full block exactly (row-wise MLP/residual; attention keys over all
    tokens), with and without a keep mask, and must declare the IDENTICAL
    param tree (checkpoint compatibility of the aggregators)."""
    from synchformer_tpu.models.layers import PreLNBlock

    x = jnp.asarray(rng.standard_normal((3, 9, D)).astype(np.float32))
    blk = PreLNBlock(num_heads=HEADS, ln_eps=1e-6)
    vs = blk.init(jax.random.PRNGKey(0), x)

    full = blk.apply(vs, x)
    cls = blk.apply(vs, x, query_rows=1)
    assert cls.shape == (3, 1, D)
    np.testing.assert_allclose(np.asarray(cls[:, 0]), np.asarray(full[:, 0]),
                               rtol=2e-5, atol=2e-6)

    keep = np.ones((3, 9), bool)
    keep[:, 4:6] = False
    keep = jnp.asarray(keep)
    full_m = blk.apply(vs, x, keep_mask=keep)
    cls_m = blk.apply(vs, x, keep_mask=keep, query_rows=1)
    np.testing.assert_allclose(np.asarray(cls_m[:, 0]),
                               np.asarray(full_m[:, 0]),
                               rtol=2e-5, atol=2e-6)

    # initializing THROUGH the query_rows path yields the same tree
    vs_q = blk.init(jax.random.PRNGKey(0), x, query_rows=1)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vs_q))
    for a, b in zip(jax.tree_util.tree_leaves(vs),
                    jax.tree_util.tree_leaves(vs_q)):
        assert a.shape == b.shape

    # the pallas impl flag routes query_rows=1 through the fused CLS-pool
    # kernel (ops/pallas/cls_pool.py; equality pinned in test_cls_pool.py) —
    # same tree, same math up to the kernel's poly-GELU tolerance
    from jax.experimental.pallas import tpu as pltpu

    blk_p = PreLNBlock(num_heads=HEADS, ln_eps=1e-6, impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        vs_p = blk_p.init(jax.random.PRNGKey(0), x, query_rows=1)
        cls_p = blk_p.apply(vs, x, query_rows=1)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vs_p))
    np.testing.assert_allclose(np.asarray(cls_p), np.asarray(cls),
                               rtol=2e-4, atol=3e-5)


def test_fold_video_normalize_matches_normalize_then_conv(rng):
    """fold_video_normalize: raw uint8 frames through the folded tower ==
    prepare_video_batch -> unfolded tower (the inference-path constant fold
    that removes the normalized-float materialization; exact in f32)."""
    from synchformer_tpu.ops.video import fold_video_normalize, prepare_video_batch

    model = MotionFormerEncoder(**TINY_VIS["params"])
    u8 = jnp.asarray(rng.integers(0, 256, (2, 3, 4, 16, 16, 3)).astype(np.uint8))
    variables = model.init(jax.random.PRNGKey(0),
                           prepare_video_batch(u8, train=False))
    # non-degenerate patchify (zero-init by reference parity)
    noise = np.random.default_rng(1)
    variables = jax.tree.map(
        lambda p: p + (0.05 * noise.standard_normal(p.shape)).astype(p.dtype),
        variables)

    ref_out, _ = model.apply(variables, prepare_video_batch(u8, train=False))
    folded = fold_video_normalize(variables, tower=None)
    # the fold is applied to v_encoder by default; tiny test uses the raw tree
    got_out, _ = model.apply(folded, u8.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    # originals untouched
    assert float(jnp.abs(
        variables["params"]["patch_embed_3d"]["kernel"]
        - folded["params"]["patch_embed_3d"]["kernel"]).max()) > 0


def test_motionformer_prepatchified_matches_conv_path(rng):
    """5D patch-major input (host-side patchify_frames) through the dense
    patch embed must match the 6D strided-conv path: same param tree, same
    features, for both the XLA and (CPU: interpret) paths' shared front-end."""
    from synchformer_tpu.ops.video import patchify_frames

    model = MotionFormerEncoder(**TINY_VIS["params"])
    x = rng.standard_normal((2, 3, 4, 16, 16, 3)).astype(np.float32)
    x6 = jnp.asarray(x)
    x5 = jnp.asarray(patchify_frames(x, z_block=2, patch=8))
    assert x5.shape == (2, 3, 2, 4, 2 * 8 * 8 * 3)

    v6 = model.init(jax.random.PRNGKey(0), x6)
    v5 = model.init(jax.random.PRNGKey(0), x5)
    # identical param trees (paths AND shapes) regardless of input rank
    flat6 = jax.tree_util.tree_flatten_with_path(v6)[0]
    flat5 = jax.tree_util.tree_flatten_with_path(v5)[0]
    assert [(p, l.shape) for p, l in flat6] == [(p, l.shape) for p, l in flat5]

    # non-trivial params: random instead of the zero-init patch kernel
    leaves, tree = jax.tree_util.tree_flatten(v6)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    v6 = jax.tree_util.tree_unflatten(
        tree, [jax.random.normal(k, l.shape, l.dtype) * 0.02
               for k, l in zip(keys, leaves)])

    f6, _ = model.apply(v6, x6)
    f5, _ = model.apply(v6, x5)
    np.testing.assert_allclose(np.asarray(f6), np.asarray(f5),
                               rtol=2e-4, atol=2e-5)

    # uint8 input + folded normalization: the production eval path
    from synchformer_tpu.ops.video import fold_video_normalize

    u8 = rng.integers(0, 256, (2, 3, 4, 16, 16, 3)).astype(np.uint8)
    vf = fold_video_normalize(v6, tower=None)
    g6, _ = model.apply(vf, jnp.asarray(u8))
    g5, _ = model.apply(vf, jnp.asarray(patchify_frames(u8, z_block=2, patch=8)))
    np.testing.assert_allclose(np.asarray(g6), np.asarray(g5),
                               rtol=2e-4, atol=2e-5)
