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
- pitch shift: sox 'pitch <cents>' semantics (ref: transforms.py:734-739 ==
  sox pitch.c): a WSOLA time-stretch by 2^(cents/1200) (sox tempo defaults:
  82 ms segment / 14.68 ms search / 12 ms overlap) followed by a
  windowed-sinc rate conversion back to the original duration. The WSOLA
  search runs as one (search, overlap) correlation matmul per output segment
  inside a lax.scan; the rate conversion has fully static geometry (the
  shift is a config constant), so it compiles to one gather + one weighted
  reduction.
- reverb: sox 'reverb' (ref: transforms.py:758-785), which is freeverb —
  8 parallel lowpass-feedback combs + 4 series allpasses per channel with
  sox reverb.c's exact tunings (44.1 kHz comb lengths 1116..1617 scaled by
  sample-rate ratio and room scale, stereo spread ±12 samples, feedback
  derived from reverberance via sox's log-map). A mono input produces sox's
  two stereo channels which are averaged, matching the reference's
  `wave.mean(dim=0)` after `reverb -w` (wet only). The per-sample comb
  recurrence is restructured into delay-length blocks: the cross-block
  dependency is a lax.scan, the in-block lowpass state is a lower-triangular
  Toeplitz matmul (MXU), so nothing runs at audio rate.
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


# ---------------------------------------------------------------------------
# sox tempo (WSOLA) + pitch
# ---------------------------------------------------------------------------

def tempo_wsola(x: jnp.ndarray, factor: float, sample_rate: int,
                segment_ms: float = 82.0, search_ms: float = 14.68,
                overlap_ms: float = 12.0) -> jnp.ndarray:
    """sox 'tempo' (WSOLA): change speed, keep pitch. factor > 1 speeds up
    (shorter output); output length is round(n / factor).

    Per output segment: search the ``search`` window around the nominal input
    position for the offset whose overlap region best matches the previous
    output tail — sox tempo.c's criterion, the least-squares difference
    sum((tail - candidate)^2), minimized over every offset in [0, search)
    (sox's opt-in quick-search coarse stepping is not replicated; it is off
    for the pitch effect) — then linearly cross-fade over ``overlap``
    samples. Geometry (segment positions, frame indices) is static; only the
    per-batch argmin offset is data-dependent, so the whole stretch is one
    lax.scan of (search, overlap) matmuls + take_along_axis gathers.
    """
    x32 = x.astype(jnp.float32)
    n = x.shape[-1]
    seg = max(int(sample_rate * segment_ms / 1000 + 0.5), 2)
    ov = max(min(int(sample_rate * overlap_ms / 1000 + 0.5), seg - 1), 1)
    search = max(int(sample_rate * search_ms / 1000 + 0.5), 1)
    hop = seg - ov
    assert hop > ov, (
        f"overlap ({ov}) must be < segment - overlap ({hop}): chunk assembly "
        "emits exactly `hop` samples per iteration")
    n_out = int(round(n / factor))
    if n_out <= ov:
        return x32[..., :n_out]
    k_iters = -(-(n_out - ov) // hop)
    base = (np.arange(k_iters, dtype=np.float64) * hop * factor
            + 0.5).astype(np.int64)
    need = int(base[-1]) + search + seg
    xp = jnp.pad(x32, [(0, 0)] * (x.ndim - 1) + [(0, max(0, need - n))])
    ov_idx = jnp.asarray(np.arange(search)[:, None]
                         + np.arange(ov)[None, :])          # (search, ov)
    w = (jnp.arange(ov, dtype=jnp.float32) / ov)            # fade-in ramp

    def step(tail, bk):
        region = jax.lax.dynamic_slice_in_dim(xp, bk, search + seg, axis=-1)
        fr = region[..., ov_idx]                            # (..., search, ov)
        # least squares: ||tail - fr||^2 = ||tail||^2 - 2 corr + ||fr||^2;
        # ||tail||^2 is offset-independent, so minimize (energy - 2 corr)
        corr = jnp.einsum("...so,...o->...s", fr, tail)
        energy = jnp.sum(fr * fr, axis=-1)
        o = jnp.argmin(energy - 2.0 * corr, axis=-1)        # (...,)
        seg_idx = o[..., None] + jnp.arange(seg)            # (..., seg)
        seg_k = jnp.take_along_axis(region, seg_idx, axis=-1)
        head = tail * (1.0 - w) + seg_k[..., :ov] * w
        chunk = jnp.concatenate([head, seg_k[..., ov:hop]], axis=-1)
        return seg_k[..., hop:], chunk

    tail0 = xp[..., :ov]   # prime with the true signal start: k=0 matches at
    #                        offset 0 and the head comes out bit-exact
    final_tail, chunks = jax.lax.scan(step, tail0, jnp.asarray(base))
    chunks = jnp.moveaxis(chunks, 0, -2).reshape(*x.shape[:-1], k_iters * hop)
    out = jnp.concatenate([chunks, final_tail], axis=-1)
    return out[..., :n_out]


def pitch_shift(x: jnp.ndarray, sample_rate: int, shift_cents: float) -> jnp.ndarray:
    """sox 'pitch <cents>' + 'rate <sr>' (ref: transforms.py:734-739).

    sox's pitch effect is tempo (WSOLA) with factor 1/2^(cents/1200) — a
    duration change with pitch preserved — followed by a rate conversion
    that restores the original duration, net-shifting every frequency by
    2^(cents/1200) (sox pitch.c wraps tempo.c exactly this way). The rate
    step here is a kaiser-windowed-sinc interpolation evaluated at the
    (static) positions m * 2^(cents/1200): one gather + one weighted sum.
    """
    d = 2.0 ** (shift_cents / 1200.0)
    if d == 1.0:
        return x
    stretched = tempo_wsola(x, 1.0 / d, sample_rate)
    n = x.shape[-1]
    ns = stretched.shape[-1]
    # windowed-sinc interpolation at t_m = m * d (input-sample units)
    width, rolloff, beta = 6, 0.99, 14.769656459379492
    fc = min(1.0, 1.0 / d) * rolloff
    half = int(math.ceil(width / fc))
    pos = np.arange(n, dtype=np.float64) * d                # (n,)
    lo = np.floor(pos).astype(np.int64) - half
    taps = np.arange(2 * half + 2)                          # (K,)
    idx = lo[:, None] + taps[None, :]                       # (n, K)
    t = (idx - pos[:, None]) * fc                           # in cutoff periods
    tcl = np.clip(t / width, -1.0, 1.0)
    window = np.i0(beta * np.sqrt(1.0 - tcl ** 2)) / np.i0(beta)
    kern = np.sinc(t) * window * fc
    kern[np.abs(t) > width] = 0.0
    kern[(idx < 0) | (idx >= ns)] = 0.0                     # zero-padded edges
    idx = np.clip(idx, 0, ns - 1)
    out = jnp.sum(stretched[..., jnp.asarray(idx)]
                  * jnp.asarray(kern.astype(np.float32)), axis=-1)
    return out.astype(x.dtype)


def random_pitch_shift(x: jnp.ndarray, rng: jax.Array, p: float,
                       sample_rate: int, shift: float = 1000.0) -> jnp.ndarray:
    apply = jax.random.bernoulli(rng, p, x.shape[:1])

    def _shifted(x):
        shifted = pitch_shift(x, sample_rate, shift)
        return jnp.where(apply.reshape((-1,) + (1,) * (x.ndim - 1)), shifted, x)

    # batch-level gate: when no row draws the aug, skip the whole
    # WSOLA+sinc chain on device instead of computing-then-discarding it
    # (ref per-clip gating: dataset/transforms.py:727-785)
    return jax.lax.cond(jnp.any(apply), _shifted, lambda x: x, x)


# ---------------------------------------------------------------------------
# sox reverb (freeverb)
# ---------------------------------------------------------------------------

# sox reverb.c tunings: filter delay lengths in samples at 44100 Hz.
_SOX_COMB_LENGTHS = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
_SOX_ALLPASS_LENGTHS = (225, 341, 441, 556)
_SOX_STEREO_ADJUST = 12


def sox_reverb_geometry(sample_rate: float, reverberance: float = 50.0,
                        hf_damping: float = 50.0, room_scale: float = 100.0,
                        stereo_depth: float = 100.0, wet_gain_db: float = 0.0):
    """Per-channel comb/allpass delay lengths + scalar filter constants,
    exactly as sox reverb.c derives them (reverb_create /
    filter_array_create). A mono input with stereo_depth > 0 yields two
    channels whose delays are spread by ±12 samples with alternating sign."""
    r = sample_rate / 44100.0
    scale = room_scale / 100.0 * 0.9 + 0.1
    depth = stereo_depth / 100.0
    a = -1.0 / math.log(1.0 - 0.3)                 # minimum feedback
    b = 100.0 / (math.log(1.0 - 0.98) * a + 1.0)   # maximum feedback
    feedback = 1.0 - math.exp((reverberance - b) / (a * b))
    damping = hf_damping / 100.0 * 0.3 + 0.2
    gain = 10.0 ** (wet_gain_db / 20.0) * 0.015
    channels = []
    for c in range(2 if depth > 0 else 1):
        offset = c * depth
        combs, allpasses = [], []
        # sox filter_array_create applies the stereo-spread offset to the
        # 44.1 kHz BASE length, before the rate/room scaling:
        #   comb:    len = r * scale * (length + stereo_adjust * offset) + .5
        #   allpass: len = r *         (length + stereo_adjust * offset) + .5
        for length in _SOX_COMB_LENGTHS:
            combs.append(int(r * scale
                             * (length + _SOX_STEREO_ADJUST * offset) + 0.5))
            offset = -offset
        for length in _SOX_ALLPASS_LENGTHS:
            allpasses.append(int(r
                                 * (length + _SOX_STEREO_ADJUST * offset)
                                 + 0.5))
            offset = -offset
        channels.append((combs, allpasses))
    return channels, feedback, damping, gain


def _comb_bank(x: jnp.ndarray, delays: jnp.ndarray, max_delay: int,
               feedback: float, damping: float, blk: int) -> jnp.ndarray:
    """Sum of freeverb lowpass-feedback combs (sox comb_process):
        out[n]   = buf[n-d]
        store[n] = (1-damping) * out[n] + damping * store[n-1]
        buf[n]   = in[n] + feedback * store[n]
    All C combs run in ONE lax.scan over blk-sample blocks: the carry holds
    each comb's last ``max_delay`` buffer samples, the d-delayed read is a
    vmapped dynamic_slice (delay lengths are traced, so every comb — and
    both stereo-spread channels — share one compiled scan body), and the
    in-block lowpass-store recurrence is a lower-triangular Toeplitz matmul
    over exponential damping weights (MXU), so no per-sample loop survives.
    Requires blk <= min(delays)."""
    n = x.shape[-1]
    c = delays.shape[0]
    nb = -(-n // blk)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, nb * blk - n)])
    xb = jnp.moveaxis(xp.reshape(*x.shape[:-1], nb, blk), -2, 0)
    t_idx = np.arange(blk)
    delta = t_idx[:, None] - t_idx[None, :]
    toep_j = jnp.asarray(np.where(
        delta >= 0, (1.0 - damping) * damping ** np.maximum(delta, 0),
        0.0).astype(np.float32))
    pows_j = jnp.asarray((damping ** (t_idx + 1.0)).astype(np.float32))
    starts = max_delay - delays                              # (C,)
    slice_d = jax.vmap(
        lambda h, s: jax.lax.dynamic_slice_in_dim(h, s, blk, axis=-1),
        in_axes=(-2, 0), out_axes=-2)

    def step(carry, xblk):
        hist, s0 = carry                                    # (...,C,maxd),(...,C)
        out = slice_d(hist, starts)                         # (..., C, blk)
        store = (jnp.einsum("...cj,tj->...ct", out, toep_j)
                 + s0[..., None] * pows_j)
        buf = xblk[..., None, :] + feedback * store
        hist = jnp.concatenate([hist[..., blk:], buf], axis=-1)
        return (hist, store[..., -1]), jnp.sum(out, axis=-2)

    init = (jnp.zeros(x.shape[:-1] + (c, max_delay), jnp.float32),
            jnp.zeros(x.shape[:-1] + (c,), jnp.float32))
    _, outs = jax.lax.scan(step, init, xb)
    y = jnp.moveaxis(outs, 0, -2).reshape(*x.shape[:-1], nb * blk)
    return y[..., :n]


def _allpass_chain(x: jnp.ndarray, delays: jnp.ndarray, max_delay: int,
                   blk: int) -> jnp.ndarray:
    """Series freeverb allpasses (sox allpass_process):
        out[n] = buf[n-d] - in[n];  buf[n] = in[n] + 0.5 * buf[n-d]
    Outer scan over the (traced) delay list — one compiled body serves every
    allpass in the chain; inner scan over blk-sample blocks with a
    dynamic-slice delayed read (no intra-block dependency at all).
    Requires blk <= min(delays)."""
    n = x.shape[-1]
    nb = -(-n // blk)
    pad = [(0, 0)] * (x.ndim - 1)

    def one_allpass(y, d):
        yp = jnp.pad(y, pad + [(0, nb * blk - n)])
        yb = jnp.moveaxis(yp.reshape(*y.shape[:-1], nb, blk), -2, 0)
        start = max_delay - d

        def step(hist, yblk):
            delayed = jax.lax.dynamic_slice_in_dim(hist, start, blk, axis=-1)
            hist = jnp.concatenate([hist[..., blk:], yblk + 0.5 * delayed],
                                   axis=-1)
            return hist, delayed - yblk

        _, outs = jax.lax.scan(
            step, jnp.zeros(y.shape[:-1] + (max_delay,), jnp.float32), yb)
        out = jnp.moveaxis(outs, 0, -2).reshape(*y.shape[:-1], nb * blk)
        return out[..., :n], None

    y, _ = jax.lax.scan(one_allpass, x, delays)
    return y


def reverb(x: jnp.ndarray, sample_rate: int, reverberance: float = 50.0,
           hf_damping: float = 50.0, room_scale: float = 100.0,
           stereo_depth: float = 100.0, pre_delay_ms: float = 0.0,
           wet_gain_db: float = 0.0, wet_only: bool = True) -> jnp.ndarray:
    """sox 'reverb' on a mono signal (freeverb; sox reverb.c semantics and
    defaults). With stereo_depth > 0, the mono input drives sox's two
    spread-delay filter arrays and the two wet channels are averaged —
    exactly what the reference computes via `apply_effects_tensor(...,
    [['reverb', '-w']])` then `wave.mean(dim=0)` (ref: transforms.py:758-785).
    wet_only=True is sox's `-w`."""
    channels, feedback, damping, gain = sox_reverb_geometry(
        sample_rate, reverberance, hf_damping, room_scale, stereo_depth,
        wet_gain_db)
    x32 = x.astype(jnp.float32)
    n = x.shape[-1]
    if pre_delay_ms > 0:
        dpre = int(sample_rate * pre_delay_ms / 1000.0 + 0.5)
        x32 = jnp.pad(x32, [(0, 0)] * (x.ndim - 1) + [(dpre, 0)])[..., :n]
    comb_max = max(d for combs, _ in channels for d in combs)
    comb_blk = min(128, min(d for combs, _ in channels for d in combs))
    ap_max = max(d for _, aps in channels for d in aps)
    ap_blk = min(64, min(d for _, aps in channels for d in aps))
    wet = None
    for combs, allpasses in channels:
        y = _comb_bank(x32, jnp.asarray(combs, jnp.int32), comb_max,
                       feedback, damping, comb_blk)
        y = _allpass_chain(y, jnp.asarray(allpasses, jnp.int32), ap_max,
                           ap_blk)
        wet = y if wet is None else wet + y
    wet = wet * (gain / len(channels))
    return wet if wet_only else x32 + wet


def random_reverb(x: jnp.ndarray, rng: jax.Array, p: float,
                  sample_rate: int) -> jnp.ndarray:
    """AudioRandomReverb (ref: transforms.py:758-785): sox `reverb -w`
    defaults, stereo wet pair averaged back to mono."""
    apply = jax.random.bernoulli(rng, p, x.shape[:1])

    def _wet(x):
        wet = reverb(x, sample_rate)
        return jnp.where(apply.reshape((-1,) + (1,) * (x.ndim - 1)), wet, x)

    # batch-level gate: skip the comb/allpass banks entirely when no row
    # draws the aug (ref per-clip gating: dataset/transforms.py:727-785)
    return jax.lax.cond(jnp.any(apply), _wet, lambda x: x, x)


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


def segment_pcm(pcm_full: jnp.ndarray, seg_starts: jnp.ndarray,
                seg_len: int) -> jnp.ndarray:
    """Gather sliding-window segments from a contiguous per-clip waveform on
    device: (..., n) f32 + (..., S) int32 starts -> (..., S, seg_len)."""
    idx = seg_starts[..., None] + jnp.arange(seg_len)       # (..., S, seg_len)
    return jnp.take_along_axis(pcm_full[..., None, :], idx, axis=-1)


def aug_then_segment(pcm_full: jnp.ndarray, seg_starts: jnp.ndarray,
                     seg_len: int, rng: jax.Array, p: float,
                     sample_rate: int) -> jnp.ndarray:
    """Reference aug placement: the five AudioRandom* effects run on the
    contiguous temporally-cropped waveform BEFORE GenerateMultipleSegments
    (ref: configs/sync.yaml:151-171), so overlapping segments share identical
    augmented samples and reverb/WSOLA continuity spans segment boundaries.
    The segment gather afterwards is a static-shape take_along_axis."""
    return segment_pcm(random_audio_aug_chain(pcm_full, rng, p, sample_rate),
                       seg_starts, seg_len)
