"""Numerical parity tests for the torch->flax checkpoint converter.

Golden references are built from STOCK torch.nn / HuggingFace transformers
primitives (the same libraries the reference composes), NOT from the
reference repo: a randomly-initialized HF ASTModel, nn.TransformerEncoderLayer
(the aggregators' base), and a hand-assembled pre-LN attention block in the
minGPT parameterization. Converted weights must reproduce torch outputs to
float tolerance — this is the machinery that will load the three published
reference checkpoints.
"""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from synchformer_tpu.models.layers import PreLNBlock
from synchformer_tpu.models.aggregators import CLSPoolEncoderLayer
from synchformer_tpu.models.ast_encoder import ASTEncoder
from synchformer_tpu.utils.checkpoint import (
    convert_ast,
    convert_cls_pool_layer,
    convert_preln_block_from_separate_qkv,
    convert_torch_encoder_layer,
)

D, HEADS = 64, 4


def test_torch_encoder_layer_parity(rng):
    """nn.TransformerEncoderLayer(norm_first, GELU) == PreLNBlock after
    conversion — the BaseEncoderLayer math used by every aggregator."""
    torch.manual_seed(0)
    layer = tnn.TransformerEncoderLayer(
        d_model=D, nhead=HEADS, dim_feedforward=4 * D, dropout=0.0,
        activation=tnn.GELU(), batch_first=True, norm_first=True,
        layer_norm_eps=1e-6)
    layer.eval()
    x = rng.standard_normal((3, 7, D)).astype(np.float32)
    with torch.no_grad():
        golden = layer(torch.from_numpy(x)).numpy()

    sd = {f"l.{k}": v for k, v in layer.state_dict().items()}
    params = convert_torch_encoder_layer(sd, "l")
    block = PreLNBlock(num_heads=HEADS, ln_eps=1e-6)
    out = block.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), golden, rtol=1e-4, atol=1e-5)


def test_cls_pool_layer_parity(rng):
    """CLS-prepend + encoder layer + CLS readout == torch equivalent."""
    torch.manual_seed(1)
    layer = tnn.TransformerEncoderLayer(
        d_model=D, nhead=HEADS, dim_feedforward=4 * D, dropout=0.0,
        activation=tnn.GELU(), batch_first=True, norm_first=True,
        layer_norm_eps=1e-6)
    layer.eval()
    cls_tok = torch.randn(1, 1, D) * 0.02
    x = rng.standard_normal((3, 7, D)).astype(np.float32)
    with torch.no_grad():
        xt = torch.cat([cls_tok.expand(3, -1, -1), torch.from_numpy(x)], dim=1)
        golden = layer(xt)[:, 0, :].numpy()

    sd = {f"agg.{k}": v for k, v in layer.state_dict().items()}
    sd["agg.cls_token"] = cls_tok
    params = convert_cls_pool_layer(sd, "agg")
    mod = CLSPoolEncoderLayer(num_heads=HEADS, ln_eps=1e-6)
    out = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), golden, rtol=1e-4, atol=1e-5)


class _MinGPTBlock(tnn.Module):
    """Stock-torch assembly of the minGPT block parameterization used by the
    sync transformer (separate q/k/v Linears; mlp Sequential)."""

    def __init__(self, d, heads):
        super().__init__()
        self.ln1 = tnn.LayerNorm(d)
        self.ln2 = tnn.LayerNorm(d)

        class _Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.query = tnn.Linear(d, d)
                self.key = tnn.Linear(d, d)
                self.value = tnn.Linear(d, d)
                self.proj = tnn.Linear(d, d)

            def forward(self, x):
                b, t, c = x.shape
                hd = c // heads
                q = self.query(x).view(b, t, heads, hd).transpose(1, 2)
                k = self.key(x).view(b, t, heads, hd).transpose(1, 2)
                v = self.value(x).view(b, t, heads, hd).transpose(1, 2)
                att = (q @ k.transpose(-2, -1)) / (hd ** 0.5)
                y = att.softmax(-1) @ v
                return self.proj(y.transpose(1, 2).reshape(b, t, c))

        self.attn = _Attn()
        self.mlp = tnn.Sequential(tnn.Linear(d, 4 * d), tnn.GELU(),
                                  tnn.Linear(4 * d, d), tnn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.ln1(x))
        return x + self.mlp(self.ln2(x))


def test_mingpt_block_parity(rng):
    torch.manual_seed(2)
    block_t = _MinGPTBlock(D, HEADS).eval()
    x = rng.standard_normal((2, 9, D)).astype(np.float32)
    with torch.no_grad():
        golden = block_t(torch.from_numpy(x)).numpy()

    sd = {f"blocks.0.{k}": v for k, v in block_t.state_dict().items()}
    params = convert_preln_block_from_separate_qkv(sd, "blocks.0")
    block = PreLNBlock(num_heads=HEADS, ln_eps=1e-5)
    out = block.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), golden, rtol=1e-4, atol=1e-5)


def test_hf_ast_trunk_parity(rng):
    """Full HF ASTModel trunk (random weights, max_length=66 -> 74 tokens)
    vs converted ASTEncoder trunk output."""
    from transformers import ASTConfig, ASTModel

    cfg = ASTConfig(hidden_size=D, num_hidden_layers=2, num_attention_heads=HEADS,
                    intermediate_size=4 * D, max_length=24, num_mel_bins=32,
                    patch_size=8, frequency_stride=6, time_stride=6,
                    attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    torch.manual_seed(3)
    hf = ASTModel(cfg).eval()
    # HF expects (B, max_length, num_mel_bins)
    x = rng.standard_normal((2, 24, 32)).astype(np.float32)
    with torch.no_grad():
        golden = hf(torch.from_numpy(x)).last_hidden_state.numpy()  # (B, N, D)

    sd = {f"ast.{k}": v for k, v in hf.state_dict().items()}
    params = convert_ast(sd, depth=2, max_patches=None)

    model = ASTEncoder(hidden_size=D, depth=2, num_heads=HEADS, patch_size=8,
                       frequency_stride=6, time_stride=6, num_mel_bins=32,
                       max_spec_t=24, factorize_freq_time=False)
    feats, _ = model.apply({"params": params}, jnp.asarray(x)[:, None])
    # our trunk output with factorize off: (B, 1, f*t, D) without aux tokens;
    # compare patch tokens against HF's last_hidden_state[:, 2:]
    got = np.asarray(feats[:, 0])
    np.testing.assert_allclose(got, golden[:, 2:], rtol=2e-4, atol=2e-5)


def test_ast_pos_emb_trim():
    """Converting an AudioSet-length AST trims the pos emb to 2 + f*t
    (ref: audio/ast.py:240-245)."""
    from transformers import ASTConfig, ASTModel

    cfg = ASTConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=HEADS,
                    intermediate_size=4 * D, max_length=100, num_mel_bins=32,
                    patch_size=8, frequency_stride=6, time_stride=6)
    torch.manual_seed(4)
    hf = ASTModel(cfg)
    sd = {f"ast.{k}": v for k, v in hf.state_dict().items()}
    params = convert_ast(sd, depth=1, max_patches=2 + 5 * 3)
    assert params["position_embeddings"].shape == (1, 17, D)
