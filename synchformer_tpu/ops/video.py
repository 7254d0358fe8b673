"""Device-side video transforms: normalization + train-time augmentations.

The reference applies these per dataloader worker on CPU
(ref: dataset/transforms.py:139-218,637-669). Here they are jitted elementwise
device ops, batched over (B, S) — XLA fuses them into the patch-embed
producers so they are effectively free.

Semantics reproduced:
- RGBToHalfToZeroOne + RGBNormalize(mean=std=0.5): x/255 -> (x-0.5)/0.5
  (ref: transforms.py:647-669, configs/sync.yaml:178-182)
- RandomHorizontalFlip(p) per clip (ref: transforms.py:198-218)
- RandomApplyColorDistortion: color jitter (brightness/contrast/saturation/hue,
  strength s) + random grayscale (ref: transforms.py:110-177 via torchvision)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# ITU-R 601 luma weights (torchvision rgb_to_grayscale)
_LUMA = jnp.asarray([0.299, 0.587, 0.114])


def normalize_video(x: jnp.ndarray, mean: float = 0.5, std: float = 0.5,
                    dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (..., H, W, C) -> normalized float (Motionformer stats)."""
    x = x.astype(dtype) / 255.0
    return (x - mean) / std


def random_horizontal_flip(x: jnp.ndarray, rng: jax.Array, p: float = 0.5) -> jnp.ndarray:
    """Flip the W axis independently per clip. x: (B, S, T, H, W, C)."""
    flip = jax.random.bernoulli(rng, p, (x.shape[0],))
    flipped = jnp.flip(x, axis=-2)
    return jnp.where(flip[:, None, None, None, None, None], flipped, x)


def _adjust_brightness(x, factor):
    return x * factor


def _adjust_contrast(x, factor):
    mean = jnp.mean(x * _LUMA.astype(x.dtype), axis=(-3, -2, -1), keepdims=True) * 3.0
    return (x - mean) * factor + mean


def _adjust_saturation(x, factor):
    gray = jnp.sum(x * _LUMA.astype(x.dtype), axis=-1, keepdims=True)
    return (x - gray) * factor + gray


def _adjust_hue(x, delta):
    """Approximate hue rotation in YIQ space (cheap, fully vectorized)."""
    yiq_from_rgb = jnp.asarray([[0.299, 0.587, 0.114],
                                [0.596, -0.274, -0.322],
                                [0.211, -0.523, 0.312]], dtype=x.dtype)
    rgb_from_yiq = jnp.linalg.inv(yiq_from_rgb.astype(jnp.float32)).astype(x.dtype)
    yiq = x @ yiq_from_rgb.T
    angle = 2.0 * jnp.pi * delta
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.stack([yiq[..., 0],
                     yiq[..., 1] * cos - yiq[..., 2] * sin,
                     yiq[..., 1] * sin + yiq[..., 2] * cos], axis=-1)
    return rot @ rgb_from_yiq.T


def random_color_jitter(x: jnp.ndarray, rng: jax.Array, p_color_jitter: float,
                        p_gray_scale: float, s: float = 1.0) -> jnp.ndarray:
    """Per-clip color distortion on [0, 1] video (B, S, T, H, W, C).

    Factor ranges follow SimCLR-style strength-s jitter used by the reference
    (ref: transforms.py get_color_distortion): brightness/contrast/saturation
    in [max(0, 1-0.8s), 1+0.8s], hue in [-0.2s, 0.2s]; grayscale with its own
    probability.
    """
    if p_color_jitter == 0.0 and p_gray_scale == 0.0:
        return x
    b = x.shape[0]
    keys = jax.random.split(rng, 7)
    apply_jit = jax.random.bernoulli(keys[0], p_color_jitter, (b,))
    apply_gray = jax.random.bernoulli(keys[1], p_gray_scale, (b,))

    def factor(key, lo, hi):
        return jax.random.uniform(key, (b, 1, 1, 1, 1, 1), minval=lo, maxval=hi)

    lo, hi = max(0.0, 1.0 - 0.8 * s), 1.0 + 0.8 * s
    jit = _adjust_brightness(x, factor(keys[2], lo, hi))
    jit = _adjust_contrast(jit, factor(keys[3], lo, hi))
    jit = _adjust_saturation(jit, factor(keys[4], lo, hi))
    jit = _adjust_hue(jit, jax.random.uniform(keys[5], (b, 1, 1, 1, 1),
                                              minval=-0.2 * s, maxval=0.2 * s))
    jit = jnp.clip(jit, 0.0, 1.0)
    x = jnp.where(apply_jit[:, None, None, None, None, None], jit, x)

    gray = jnp.broadcast_to(jnp.sum(x * _LUMA.astype(x.dtype), axis=-1, keepdims=True),
                            x.shape)
    x = jnp.where(apply_gray[:, None, None, None, None, None], gray, x)
    return x


def resize_bilinear(x: jnp.ndarray, out_hw, antialias: bool = False) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) — RGBSpatialCropSometimesUpscale's
    upscale step (ref: transforms.py:110-137; torchvision antialias=None)."""
    out_shape = (*x.shape[:-3], out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear", antialias=antialias)


def prepare_video_batch(video_u8: jnp.ndarray, rng: Optional[jax.Array] = None,
                        train: bool = False, p_horizontal_flip: float = 0.5,
                        p_color_jitter: float = 0.0, p_gray_scale: float = 0.0,
                        dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (B, S, T, H, W, C) -> normalized float, with train augs."""
    x = video_u8.astype(dtype) / 255.0
    if train and rng is not None:
        k1, k2 = jax.random.split(rng)
        x = random_color_jitter(x, k1, p_color_jitter, p_gray_scale)
        x = random_horizontal_flip(x, k2, p_horizontal_flip)
    return (x - 0.5) / 0.5


def fold_video_normalize(params, tower: str = "v_encoder",
                         conv: str = "patch_embed_3d",
                         mean: float = 0.5, std: float = 0.5):
    """Fold the eval-path video normalization into the patchify conv weights.

    normalize_video is the affine y = x/255/std' - mean/std (mean=std=0.5 ->
    y = x*(2/255) - 1); convolution is linear, so
    conv(y) = conv(x * s) + conv(-m * ones) = s*conv(x) - sum(kernel)*m + bias.
    With the fold applied, raw uint8 frames go STRAIGHT into the tower (one
    fusible u8->dtype convert) and the (B,S,16,224,224,3) normalized-float
    materialization + its relayout copy in front of the conv disappear
    (measured on v5e: 342.3 -> 339.0 ms/iter e2e, profile: the 1.42 ms
    normalize fusion + part of the 2.45 ms layout copy).

    Inference-only (train-time augs act on the [0,1] scale before
    normalization). Exact in f32; in bf16 the fold changes rounding by
    <=1 ulp of the conv output (tested: tests/test_models.py).

    Returns a NEW params pytree (originals untouched).
    """
    import jax

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    root = params["params"] if "params" in params else params
    root = dict(root)
    # tower=None: the conv lives at the tree root (bare MotionFormerEncoder)
    tower_d = root if tower is None else dict(root[tower])
    pe = dict(tower_d[conv])
    k, b = pe["kernel"], pe["bias"]
    scale = 1.0 / (255.0 * std)
    shift = mean / std
    axes = tuple(range(k.ndim - 1))  # sum over taps + input channels
    tower_d[conv] = {"kernel": k * scale, "bias": b - jnp.sum(k, axis=axes) * shift}
    if tower is not None:
        root[tower] = tower_d
    if "params" in params:
        params = dict(params)
        params["params"] = root
        return params
    return root


def patchify_frames(x, z_block: int = 2, patch: int = 16):
    """(..., T, H, W, C) frames -> (..., T//z, (H//p)*(W//p), z*p*p*C)
    patch-major tokens for the dense patch embed (motionformer 5D input).

    Pure byte shuffle (host-side im2col for the 3D patch conv): the patch
    vector is flattened in (z, ph, pw, c) order, matching the conv kernel's
    (z, p, p, c, D) flatten, so `tokens @ kernel.reshape(-1, D)` equals the
    strided conv exactly. Works on numpy arrays (loader/staging side) and
    jnp arrays alike; uint8 passes through untouched (the patch embed casts).

    Why: on TPU the strided patch conv forces a batch-in-sublanes input
    relayout and runs ~2.2x above its matmul floor; patch-major input turns
    it into one clean MXU matmul (ref geometry: video_model_builder.py:61,
    vit_helper.py:59-77).
    """
    *lead, t, h, w, c = x.shape
    f, gh, gw = t // z_block, h // patch, w // patch
    assert t == f * z_block and h == gh * patch and w == gw * patch, x.shape
    x = x.reshape(*lead, f, z_block, gh, patch, gw, patch, c)
    n = len(lead)
    # (..., f, z, gh, ph, gw, pw, c) -> (..., f, gh, gw, z, ph, pw, c)
    perm = tuple(range(n)) + tuple(i + n for i in (0, 2, 4, 1, 3, 5, 6))
    x = x.transpose(perm)
    return x.reshape(*lead, f, gh * gw, z_block * patch * patch * c)
