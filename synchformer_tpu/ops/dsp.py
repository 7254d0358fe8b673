"""Device-side audio DSP: augmentations + resampling, TPU-native.

The reference delegates these to torchaudio/sox on CPU per worker
(ref: dataset/transforms.py:672-812,892-904). Equivalents here:

- volume / gaussian noise: trivial jnp elementwise (ref: transforms.py:672-694,
  787-812)
- lowpass biquad: second-order IIR evaluated with a parallel block scan —
  the recurrence h[n] = A h[n-1] + B x[n] is a linear state-space system, so
  we scan over (matrix, vector) pairs with an associative combine; XLA maps
  ``associative_scan`` onto a log-depth tree instead of a 80k-step serial
  loop (ref: transforms.py:697-724 / torchaudio lowpass_biquad)
- resample: kaiser-windowed-sinc polyphase resampling expressed as one matmul
  per phase (MXU-friendly), matching torchaudio.functional.resample semantics
  (ref: transforms.py:892-904)
- pitch shift: resample-based shift (rate change + length-preserving sinc
  resample). NOTE: sox's 'pitch' effect time-stretches with WSOLA; all shipped
  reference configs run with p_audio_aug=0.0 (configs/sync.yaml:110), so this
  is an aug-only approximation, documented here.
- reverb: Schroeder reverberator (4 parallel feedback combs + 2 allpasses),
  an aug-only approximation of sox 'reverb -w' (ref: transforms.py:758-785).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# trivial augs
# ---------------------------------------------------------------------------

def random_volume(x: jnp.ndarray, rng: jax.Array, p: float, gain: float = 2.0,
                  gain_type: str = "amplitude") -> jnp.ndarray:
    """torchaudio.transforms.Vol with RandomApply(p) (ref: transforms.py:672-694)."""
    if gain_type == "amplitude":
        factor = gain
    elif gain_type == "db":
        factor = 10.0 ** (gain / 20.0)
    elif gain_type == "power":
        factor = math.sqrt(gain)
    else:
        raise ValueError(gain_type)
    apply = jax.random.bernoulli(rng, p, x.shape[:1])
    scaled = jnp.clip(x * factor, -1.0, 1.0)
    return jnp.where(apply.reshape((-1,) + (1,) * (x.ndim - 1)), scaled, x)


def random_gauss_noise(x: jnp.ndarray, rng: jax.Array, p: float,
                       amplitude: float = 0.01) -> jnp.ndarray:
    """Additive white noise with probability p (ref: transforms.py:787-812)."""
    k1, k2 = jax.random.split(rng)
    apply = jax.random.bernoulli(k1, p, x.shape[:1])
    noise = jax.random.normal(k2, x.shape, x.dtype) * amplitude
    return jnp.where(apply.reshape((-1,) + (1,) * (x.ndim - 1)), x + noise, x)


# ---------------------------------------------------------------------------
# biquad IIR via associative scan
# ---------------------------------------------------------------------------

def biquad_coeffs_lowpass(sample_rate: float, cutoff_freq: float,
                          q: float = 0.707) -> Tuple[np.ndarray, np.ndarray]:
    """RBJ cookbook lowpass biquad (torchaudio lowpass_biquad coefficients)."""
    w0 = 2.0 * math.pi * cutoff_freq / sample_rate
    alpha = math.sin(w0) / (2.0 * q)
    cos_w0 = math.cos(w0)
    b = np.array([(1 - cos_w0) / 2, 1 - cos_w0, (1 - cos_w0) / 2])
    a = np.array([1 + alpha, -2 * cos_w0, 1 - alpha])
    return (b / a[0]).astype(np.float64), (a / a[0]).astype(np.float64)


def biquad(x: jnp.ndarray, b: np.ndarray, a: np.ndarray) -> jnp.ndarray:
    """Apply a normalized biquad along the last axis with a parallel scan.

    Direct-form-II-transposed state space: s[n] = A s[n-1] + B x[n],
    y[n] = b0 x[n] + s1[n-1]. We express the recurrence as an affine map per
    step and combine with jax.lax.associative_scan (log-depth on device).
    """
    b0, b1, b2 = (float(v) for v in b)
    a1, a2 = float(a[1]), float(a[2])
    # state s = [s1, s2]; s1[n] = b1 x - a1 y + s2[n-1]; s2[n] = b2 x - a2 y
    # with y = b0 x + s1[n-1]. Substitute y:
    #   s1[n] = (-a1) s1[n-1] + s2[n-1] + (b1 - a1 b0) x
    #   s2[n] = (-a2) s1[n-1] +    0    + (b2 - a2 b0) x
    A = jnp.asarray([[-a1, 1.0], [-a2, 0.0]], dtype=jnp.float32)
    Bx = jnp.asarray([b1 - a1 * b0, b2 - a2 * b0], dtype=jnp.float32)

    x32 = x.astype(jnp.float32)
    n = x.shape[-1]
    # per-step affine maps: (M_n, v_n) with s_n = M_n s_{n-1} + v_n
    mats = jnp.broadcast_to(A, x.shape[:-1] + (n, 2, 2))
    vecs = x32[..., None] * Bx  # (..., n, 2)

    def combine(left, right):
        m1, v1 = left
        m2, v2 = right
        return m2 @ m1, (m2 @ v1[..., None])[..., 0] + v2

    ms, vs = jax.lax.associative_scan(combine, (mats, vecs), axis=-3)
    # s_n = vs[n] (initial state is zero)
    s1_prev = jnp.concatenate(
        [jnp.zeros_like(vs[..., :1, 0]), vs[..., :-1, 0]], axis=-1)
    y = b0 * x32 + s1_prev
    return y.astype(x.dtype)


def lowpass_biquad(x: jnp.ndarray, sample_rate: float, cutoff_freq: float,
                   q: float = 0.707) -> jnp.ndarray:
    b, a = biquad_coeffs_lowpass(sample_rate, cutoff_freq, q)
    return biquad(x, b, a)


def random_lowpass(x: jnp.ndarray, rng: jax.Array, p: float, sample_rate: float,
                   cutoff_freq: float = 100.0, q: float = 0.707) -> jnp.ndarray:
    apply = jax.random.bernoulli(rng, p, x.shape[:1])
    filtered = lowpass_biquad(x, sample_rate, cutoff_freq, q)
    return jnp.where(apply.reshape((-1,) + (1,) * (x.ndim - 1)), filtered, x)


# ---------------------------------------------------------------------------
# sinc resampling as a matmul (MXU path)
# ---------------------------------------------------------------------------

def _resample_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                     rolloff: float = 0.99, beta: float = 14.769656459379492):
    """Kaiser-windowed sinc kernel, torchaudio.functional.resample semantics.
    Returns (kernels (new/gcd, width), width, gcd-reduced freqs)."""
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = orig_freq // g, new_freq // g
    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))
    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig  # (1, K)
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx  # (new, K)
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.i0(beta * np.sqrt(1 - (t / lowpass_filter_width) ** 2)) / np.i0(beta)
    t = t * math.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * base_freq / orig
    return kernel.astype(np.float32), width, orig, new


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jnp.ndarray:
    """Polyphase sinc resample along the last axis.

    Implemented as: pad -> frame into hop=orig windows -> ONE matmul with the
    (new, K) kernel bank -> interleave phases. The matmul shape
    (n_frames, K) @ (K, new) rides the MXU, unlike a strided conv with tiny
    channel counts.
    """
    if orig_freq == new_freq:
        return x
    kernel, width, orig, new = _resample_kernel(orig_freq, new_freq,
                                                lowpass_filter_width, rolloff)
    length = x.shape[-1]
    target_len = int(math.ceil(new_freq * length / orig_freq))
    k = kernel.shape[1]

    x32 = x.astype(jnp.float32)
    num_frames = length // orig + 1
    pad_right = num_frames * orig + k - length
    xp = jnp.pad(x32, [(0, 0)] * (x.ndim - 1) + [(width, max(pad_right, 0))])
    idx = (np.arange(num_frames)[:, None] * orig + np.arange(k)[None, :])
    frames = xp[..., idx]  # (..., n_frames, K)
    phases = jnp.einsum("...fk,pk->...fp", frames, jnp.asarray(kernel),
                        precision=jax.lax.Precision.HIGHEST)  # (..., n_frames, new)
    out = phases.reshape(*x.shape[:-1], num_frames * new)
    return out[..., :target_len].astype(x.dtype)


def pitch_shift(x: jnp.ndarray, sample_rate: int, shift_cents: float) -> jnp.ndarray:
    """Resample-based pitch shift (length-preserving via linear interp).
    Approximation of sox 'pitch' (see module docstring)."""
    rate = 2.0 ** (shift_cents / 1200.0)
    n = x.shape[-1]
    # shift the spectrum by resampling, then stretch back to original length
    src = jnp.arange(n) * rate
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = (src - lo).astype(x.dtype)
    return x[..., lo] * (1 - frac) + x[..., hi] * frac


def random_pitch_shift(x: jnp.ndarray, rng: jax.Array, p: float,
                       sample_rate: int, shift: float = 1000.0) -> jnp.ndarray:
    apply = jax.random.bernoulli(rng, p, x.shape[:1])
    shifted = pitch_shift(x, sample_rate, shift)
    return jnp.where(apply.reshape((-1,) + (1,) * (x.ndim - 1)), shifted, x)


# ---------------------------------------------------------------------------
# Schroeder reverb (aug-only approximation of sox reverb)
# ---------------------------------------------------------------------------

_COMB_DELAYS_MS = (29.7, 37.1, 41.1, 43.7)
_ALLPASS_DELAYS_MS = (5.0, 1.7)


def _feedback_comb(x, delay, feedback):
    n = x.shape[-1]
    num_blocks = n // delay + 2

    def body(carry, i):
        prev = carry
        start = i * delay
        block = jax.lax.dynamic_slice_in_dim(x, start, delay, axis=-1)
        out = block + feedback * prev
        return out, out

    x_pad = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, num_blocks * delay - n)])
    init = jnp.zeros(x.shape[:-1] + (delay,), x.dtype)
    _, blocks = jax.lax.scan(
        lambda c, i: body(c, i), init, jnp.arange(num_blocks))
    blocks = jnp.moveaxis(blocks, 0, -2).reshape(*x.shape[:-1], num_blocks * delay)
    del x_pad
    return blocks[..., :n]


def reverb(x: jnp.ndarray, sample_rate: int, wet: float = 0.5,
           feedback: float = 0.74) -> jnp.ndarray:
    """Schroeder reverberator: 4 parallel combs + 2 series allpasses."""
    y = jnp.zeros_like(x)
    for ms in _COMB_DELAYS_MS:
        d = max(int(sample_rate * ms / 1000.0), 1)
        y = y + _feedback_comb(x, d, feedback)
    y = y / len(_COMB_DELAYS_MS)
    for ms in _ALLPASS_DELAYS_MS:
        d = max(int(sample_rate * ms / 1000.0), 1)
        fwd = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(d, 0)])[..., :y.shape[-1]]
        y = -0.7 * y + fwd + 0.7 * jnp.pad(fwd, [(0, 0)] * (y.ndim - 1) + [(d, 0)])[..., :y.shape[-1]]
    return (1 - wet) * x + wet * y


def random_reverb(x: jnp.ndarray, rng: jax.Array, p: float,
                  sample_rate: int) -> jnp.ndarray:
    apply = jax.random.bernoulli(rng, p, x.shape[:1])
    wet = reverb(x, sample_rate)
    return jnp.where(apply.reshape((-1,) + (1,) * (x.ndim - 1)), wet, x)


def random_audio_aug_chain(pcm: jnp.ndarray, rng: jax.Array, p: float,
                           sample_rate: int) -> jnp.ndarray:
    """The reference's five AudioRandom* transforms in their config order
    (ref: configs/sync.yaml:151-169 == configs/segment_avclip.yaml, all at
    p=${data.p_audio_aug}): reverb, volume (gain 2.0), pitch shift (1000),
    lowpass (100 Hz), gaussian noise (0.01). Device-side and jit-fused —
    the reference runs these per CPU worker."""
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    pcm = random_reverb(pcm, k1, p, sample_rate)
    pcm = random_volume(pcm, k2, p, gain=2.0)
    pcm = random_pitch_shift(pcm, k3, p, sample_rate, shift=1000.0)
    pcm = random_lowpass(pcm, k4, p, sample_rate, cutoff_freq=100.0)
    pcm = random_gauss_noise(pcm, k5, p, amplitude=0.01)
    return pcm
