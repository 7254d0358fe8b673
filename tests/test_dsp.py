"""Golden tests for device DSP ops vs scipy (biquad) and analytic signals
(resample), plus metric-module checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sps

from synchformer_tpu.ops.dsp import (
    biquad,
    biquad_coeffs_lowpass,
    lowpass_biquad,
    pitch_shift,
    random_gauss_noise,
    random_volume,
    resample,
    reverb,
    tempo_wsola,
)
from synchformer_tpu.train.metrics import calc_cls_metrics


def test_biquad_matches_scipy(rng):
    x = rng.standard_normal((2, 4_000)).astype(np.float32)
    b, a = biquad_coeffs_lowpass(16_000, 100.0, 0.707)
    golden = sps.lfilter(b, a, x, axis=-1)
    got = np.asarray(biquad(jnp.asarray(x), b, a))
    np.testing.assert_allclose(got, golden, rtol=1e-3, atol=1e-4)


def test_lowpass_attenuates_high_freq():
    t = np.arange(16_000) / 16_000
    low = np.sin(2 * np.pi * 50 * t).astype(np.float32)
    high = np.sin(2 * np.pi * 4_000 * t).astype(np.float32)
    out_low = np.asarray(lowpass_biquad(jnp.asarray(low), 16_000, 100.0))
    out_high = np.asarray(lowpass_biquad(jnp.asarray(high), 16_000, 100.0))
    assert np.abs(out_low[8_000:]).max() > 0.5      # passband mostly intact
    assert np.abs(out_high[8_000:]).max() < 0.01    # stopband crushed


@pytest.mark.parametrize("orig,new", [(48_000, 16_000), (44_100, 16_000), (16_000, 8_000)])
def test_resample_preserves_tone(orig, new):
    dur = 0.5
    t = np.arange(int(orig * dur)) / orig
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), orig, new))
    expected_len = int(np.ceil(new * len(x) / orig))
    assert y.shape[-1] == expected_len
    t_new = np.arange(expected_len) / new
    ideal = np.sin(2 * np.pi * 440.0 * t_new)
    # ignore filter edge effects
    sl = slice(200, -200)
    corr = np.corrcoef(y[sl], ideal[sl])[0, 1]
    assert corr > 0.999, corr


@pytest.mark.parametrize("orig,new", [(9, 5), (3, 1), (5, 7)])
def test_resample_matches_direct_sinc_evaluation(orig, new):
    """Point-for-point oracle, independent of the polyphase/matmul structure:
    y[i] = sum_n x[n] * k((n - i*orig/new) * base/orig), with k the
    Kaiser-windowed sinc (lowpass_filter_width=6, rolloff=0.99,
    beta=14.769656..., the torchaudio.functional.resample parameterization;
    ref: torchaudio _apply_sinc_resample_kernel semantics). Evaluated with a
    literal double loop in float64."""
    lfw, rolloff, beta = 6, 0.99, 14.769656459379492
    rng = np.random.default_rng(42)
    x = rng.standard_normal(400).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), orig, new,
                            lowpass_filter_width=lfw, rolloff=rolloff))

    base = min(orig, new) * rolloff
    out_len = int(np.ceil(new * len(x) / orig))

    def k(t):  # t already in units of base periods
        t = np.clip(t, -lfw, lfw)
        window = np.i0(beta * np.sqrt(1 - (t / lfw) ** 2)) / np.i0(beta)
        return np.sinc(t) * window * base / orig

    golden = np.zeros(out_len)
    for i in range(out_len):
        tau = i * orig / new
        for n in range(len(x)):
            golden[i] += x[n] * k((n - tau) * base / orig)
    np.testing.assert_allclose(y[:out_len], golden, rtol=1e-4, atol=1e-5)


def test_resample_multitone_spectrum_preserved():
    """Property golden (implementation-independent): every bandlimited tone
    survives resampling with its FFT amplitude intact to <1%. A resampler
    with the documented torchaudio semantics (kaiser sinc, rolloff .99) must
    satisfy this; a formula bug (wrong phase table, off-by-one hop) cannot."""
    orig, new, dur = 22_050, 16_000, 1.0
    freqs = [300.0, 1_200.0, 3_000.0]   # well inside the passband (< Nyq/2)
    amps = [1.0, 0.5, 0.25]
    t = np.arange(int(orig * dur)) / orig
    x = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    y = np.asarray(resample(jnp.asarray(x.astype(np.float32)), orig, new))
    # exact-frequency projection (FFT peak bins suffer scalloping loss)
    seg = y[1_000:-1_000]
    tt = (np.arange(len(seg)) + 1_000) / new
    for f, a in zip(freqs, amps):
        measured = 2 * np.abs(np.mean(seg * np.exp(-2j * np.pi * f * tt)))
        assert abs(measured - a) < 0.005 * max(a, 1.0), (f, measured, a)
    # a transition-band tone (6 kHz vs the ~7.92 kHz rolloff cutoff) shows
    # the width-6 filter's documented early rolloff: ~12% attenuation, far
    # from either 0% (no filter) or 100% (brick wall misplaced)
    x6 = 0.125 * np.sin(2 * np.pi * 6_000.0 * t)
    y6 = np.asarray(resample(jnp.asarray(x6.astype(np.float32)), orig, new))
    seg6 = y6[1_000:-1_000]
    m6 = 2 * np.abs(np.mean(seg6 * np.exp(-2j * np.pi * 6_000.0 * tt)))
    assert 0.6 * 0.125 < m6 < 0.99 * 0.125, m6


def test_resample_alias_rejection():
    """A tone above the target Nyquist must be attenuated after downsampling
    (the anti-aliasing lowpass engages). The width-6 kaiser default reaches
    ~-20 dB at 1.25x Nyquist — assert >18 dB, and that it's not a brick wall
    artifact either (output is not exactly zero)."""
    orig, new = 32_000, 16_000
    t = np.arange(orig) / orig
    x = np.sin(2 * np.pi * 10_000.0 * t).astype(np.float32)  # > 8 kHz Nyquist
    y = np.asarray(resample(jnp.asarray(x), orig, new))
    rms_in = np.sqrt(np.mean(x ** 2))
    rms_out = np.sqrt(np.mean(y[500:-500] ** 2))
    assert rms_out < rms_in * 10 ** (-18 / 20), (rms_in, rms_out)
    assert rms_out > 0.0


def test_resample_roundtrip_bandlimited():
    """16k -> 22.05k -> 16k on sub-6kHz content returns the input (interior
    samples) to ~1e-3 — phase table and hop alignment are self-consistent."""
    rng = np.random.default_rng(3)
    # bandlimited noise: random spectrum zeroed above 6 kHz
    n = 16_000
    spec = rng.standard_normal(n // 2 + 1) + 1j * rng.standard_normal(n // 2 + 1)
    bins = np.fft.rfftfreq(n, 1.0 / 16_000)
    spec[bins > 3_500] = 0.0  # well inside both passbands
    x = np.fft.irfft(spec, n).astype(np.float32)
    x /= np.abs(x).max()
    up = resample(jnp.asarray(x), 16_000, 22_050)
    back = np.asarray(resample(up, 22_050, 16_000))
    sl = slice(500, n - 500)
    np.testing.assert_allclose(back[sl], x[sl], atol=1e-2)


def test_random_volume_and_noise(rng):
    x = jnp.asarray(rng.standard_normal((4, 1_000)).astype(np.float32) * 0.1)
    loud = random_volume(x, jax.random.PRNGKey(0), p=1.0, gain=2.0)
    np.testing.assert_allclose(np.asarray(loud), np.clip(np.asarray(x) * 2, -1, 1),
                               atol=1e-6)
    same = random_volume(x, jax.random.PRNGKey(0), p=0.0, gain=2.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))
    noisy = random_gauss_noise(x, jax.random.PRNGKey(1), p=1.0, amplitude=0.01)
    diff = np.asarray(noisy) - np.asarray(x)
    assert 0.005 < diff.std() < 0.02


# --- sox reverb (freeverb) --------------------------------------------------

def _sox_reverb_scalar(x, sr, reverberance=50.0, hf_damping=50.0,
                       room_scale=100.0, stereo_depth=100.0,
                       wet_gain_db=0.0):
    """Independent float64 sample-loop transliteration of sox reverb.c
    (reverb_create / filter_array_create / comb_process / allpass_process),
    wet-only, mono input -> mean of the two spread channels (what the
    reference computes; ref: dataset/transforms.py:758-785)."""
    import math
    r = sr / 44100.0
    scale = room_scale / 100.0 * 0.9 + 0.1
    depth = stereo_depth / 100.0
    a = -1.0 / math.log(1.0 - 0.3)
    b = 100.0 / (math.log(1.0 - 0.98) * a + 1.0)
    feedback = 1.0 - math.exp((reverberance - b) / (a * b))
    damping = hf_damping / 100.0 * 0.3 + 0.2
    gain = 10.0 ** (wet_gain_db / 20.0) * 0.015
    comb_l = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
    ap_l = (225, 341, 441, 556)
    n = len(x)
    outs = []
    for c in range(2):
        offset = c * depth
        combs, aps = [], []
        # sox filter_array_create: the stereo-spread offset is added to the
        # 44.1 kHz base length BEFORE the rate/room scaling
        for length in comb_l:
            combs.append(int(r * scale * (length + 12 * offset) + 0.5))
            offset = -offset
        for length in ap_l:
            aps.append(int(r * (length + 12 * offset) + 0.5))
            offset = -offset
        bufs = [np.zeros(d) for d in combs]
        stores = [0.0] * len(combs)
        ptrs = [0] * len(combs)
        abufs = [np.zeros(d) for d in aps]
        aptrs = [0] * len(aps)
        y = np.zeros(n)
        for i in range(n):
            out = 0.0
            for k, d in enumerate(combs):
                o = bufs[k][ptrs[k]]
                stores[k] = o + (stores[k] - o) * damping
                bufs[k][ptrs[k]] = x[i] + stores[k] * feedback
                ptrs[k] = (ptrs[k] + 1) % d
                out += o
            for k, d in enumerate(aps):
                o = abufs[k][aptrs[k]]
                abufs[k][aptrs[k]] = out + o * 0.5
                aptrs[k] = (aptrs[k] + 1) % d
                out = o - out
            y[i] = out * gain
        outs.append(y)
    return (outs[0] + outs[1]) / 2.0


def test_reverb_matches_sox_scalar_spec(rng):
    """The block-parallel TPU reverb is numerically the sox reverb.c
    algorithm: compare against a literal per-sample float64 transliteration
    on 0.15 s of noise (covers ~6 comb round-trips of the shortest delay)."""
    sr, n = 16_000, 2_400
    x = (rng.standard_normal(n) * 0.3).astype(np.float32)
    golden = _sox_reverb_scalar(x.astype(np.float64), sr)
    got = np.asarray(reverb(jnp.asarray(x), sr))
    np.testing.assert_allclose(got, golden, rtol=1e-3, atol=2e-5)


def test_reverb_batched_matches_per_clip(rng):
    sr = 16_000
    x = (rng.standard_normal((3, 1_600)) * 0.2).astype(np.float32)
    batched = np.asarray(reverb(jnp.asarray(x), sr))
    for i in range(3):
        single = np.asarray(reverb(jnp.asarray(x[i]), sr))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-7)


def test_reverb_impulse_response_shape():
    """Wet-only response to a unit impulse: silent until the shortest comb
    delay, then a decaying tail (feedback < 1)."""
    sr = 16_000
    n = 6_000
    x = np.zeros(n, np.float32)
    x[0] = 1.0
    y = np.asarray(reverb(jnp.asarray(x), sr))
    # shortest comb delay at 16 kHz is channel 0's first comb:
    # int(16000/44100 * 1.0 * 1116 + .5) = 405 (channel 1's first comb is
    # int(16000/44100 * (1116 + 12) + .5) = 409)
    assert np.abs(y[:405]).max() == 0.0
    assert np.abs(y[405:1000]).max() > 1e-4
    early = np.abs(y[400:2000]).max()
    late = np.abs(y[4000:]).max()
    assert late < early  # decaying tail


# --- sox pitch (WSOLA tempo + rate) ------------------------------------------

def _dominant_freq(y, sr):
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.fft.rfftfreq(len(y), 1.0 / sr)[np.argmax(spec)]


def test_tempo_wsola_stretches_duration_keeps_pitch():
    sr, n, f0 = 16_000, 10_240, 440.0
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    for factor in (0.561231, 1.25):
        y = np.asarray(tempo_wsola(jnp.asarray(x), factor, sr))
        assert y.shape[-1] == int(round(n / factor))
        assert abs(_dominant_freq(y[200:-200], sr) - f0) < 5.0
        # amplitude preserved (no energy blow-up/collapse from the overlap-add)
        assert 0.8 < np.sqrt(np.mean(y[200:-200] ** 2)) / np.sqrt(0.5) < 1.2


@pytest.mark.parametrize("cents", [1000.0, -500.0])
def test_pitch_shift_moves_tone_by_exact_ratio(cents):
    """sox pitch semantics: duration unchanged, every frequency scaled by
    2^(cents/1200) (ref pitch aug uses shift=1000; configs/sync.yaml:162)."""
    sr, n, f0 = 16_000, 10_240, 440.0
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = np.asarray(pitch_shift(jnp.asarray(x), sr, cents))
    assert y.shape == x.shape
    expect = f0 * 2.0 ** (cents / 1200.0)
    got = _dominant_freq(y[200:-200], sr)
    assert abs(got - expect) < 6.0, (got, expect)
    assert 0.7 < np.sqrt(np.mean(y[500:-500] ** 2)) / np.sqrt(0.5) < 1.3


def test_pitch_shift_batched_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 2_560)).astype(np.float32) * 0.1)
    y = pitch_shift(x, 16_000, 1000.0)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


# --- metrics (kept here to avoid a tiny extra file) ------------------------

def test_calc_cls_metrics_basic():
    rng = np.random.default_rng(0)
    n, c = 400, 21
    targets = rng.integers(0, c, n)
    logits = rng.standard_normal((n, c)).astype(np.float32)
    logits[np.arange(n), targets] += 3.0  # make the model "good"
    m = calc_cls_metrics(targets, logits, topk=(1, 5))
    assert 0.7 < m["accuracy_1"] <= 1.0
    assert m["accuracy_5"] >= m["accuracy_1"]
    assert m["accuracy_1_tol1"] >= m["accuracy_1"]
    assert 0.5 < m["mROCAUC"] <= 1.0
    assert m["mAP"] > 0.5
    assert np.isfinite(m["dprime"])


def test_calc_cls_metrics_tol_semantics():
    # prediction one class off counts for tol1 but not plain accuracy
    targets = np.array([5, 5, 5, 5])
    logits = np.zeros((4, 21), dtype=np.float32)
    logits[0, 5] = 9.0   # exact
    logits[1, 4] = 9.0   # off by one
    logits[2, 6] = 9.0   # off by one
    logits[3, 9] = 9.0   # wrong
    m = calc_cls_metrics(targets, logits, topk=(1,), only_accuracy=True)
    assert m["accuracy_1"] == pytest.approx(0.25)
    assert m["accuracy_1_tol1"] == pytest.approx(0.75, abs=1e-4)


def test_calc_cls_metrics_missing_class_dummy_values():
    targets = np.array([0, 1, 2, 3])
    logits = np.random.default_rng(0).standard_normal((4, 21)).astype(np.float32)
    m = calc_cls_metrics(targets, logits, topk=(1,))
    assert m["mAP"] == 0.0 and m["mROCAUC"] == 0.5 and m["dprime"] == 0.0


def test_calc_cls_metrics_binary_syncability():
    rng = np.random.default_rng(0)
    targets = rng.integers(0, 2, 200)
    logits = rng.standard_normal((200, 2)).astype(np.float32)
    logits[np.arange(200), targets] += 2.0
    m = calc_cls_metrics(targets, logits, topk=(1, 5), calc_pr_rec_f1=True)
    assert "accuracy_2" not in m  # silenced for binary like the reference
    assert 0.5 < m["accuracy_1"] <= 1.0
    assert {"precision", "recall", "f1"} <= set(m)


def test_aug_then_segment_overlap_consistency(rng):
    """Augs run on the contiguous waveform BEFORE segmentation (ref:
    configs/sync.yaml:151-171): at p=1.0 the 50%-overlap region of segment k
    must be bit-identical to the head of segment k+1 — the property the
    reference's transform order guarantees and per-segment augs break."""
    from synchformer_tpu.ops.dsp import aug_then_segment

    sr, seg_len, hop, n_seg = 16_000, 512, 256, 6
    n = hop * (n_seg - 1) + seg_len + 64
    pcm = rng.standard_normal((2, n)).astype(np.float32) * 0.1
    starts = np.tile(np.arange(n_seg, dtype=np.int32) * hop, (2, 1))
    out = np.asarray(aug_then_segment(jnp.asarray(pcm), jnp.asarray(starts),
                                      seg_len, jax.random.PRNGKey(3), 1.0, sr))
    assert out.shape == (2, n_seg, seg_len)
    for k in range(n_seg - 1):
        np.testing.assert_array_equal(out[:, k, hop:], out[:, k + 1, :hop])


def test_aug_then_segment_p0_is_pure_gather(rng):
    """p=0 must be bit-identical to a plain host-side segment gather."""
    from synchformer_tpu.ops.dsp import aug_then_segment, segment_pcm

    seg_len, hop, n_seg = 320, 160, 5
    n = hop * (n_seg - 1) + seg_len
    pcm = rng.standard_normal((3, n)).astype(np.float32)
    starts = np.tile(np.arange(n_seg, dtype=np.int32) * hop, (3, 1))
    got = np.asarray(aug_then_segment(jnp.asarray(pcm), jnp.asarray(starts),
                                      seg_len, jax.random.PRNGKey(0), 0.0,
                                      16_000))
    host = np.stack([pcm[b, starts[b, :, None] + np.arange(seg_len)]
                     for b in range(3)])
    np.testing.assert_array_equal(got, host)
    np.testing.assert_array_equal(
        np.asarray(segment_pcm(jnp.asarray(pcm), jnp.asarray(starts), seg_len)),
        host)


def test_prepare_item_ships_preseg_audio_when_augs_on(rng):
    """With p_audio_aug>0 the loader emits the contiguous cropped waveform +
    segment starts, and gathering them reproduces the segmented audio
    bit-exactly; with p=0 (or eval) the extra keys are absent so the p=0
    batch layout is unchanged."""
    from synchformer_tpu.data.transforms import SyncPipelineConfig, prepare_item
    from synchformer_tpu.ops.dsp import segment_pcm

    video = rng.integers(0, 255, (250, 64, 64, 3), dtype=np.uint8)
    audio = rng.standard_normal(160_000).astype(np.float32)
    cfg = SyncPipelineConfig(n_segments=14, input_size=48,
                             size_before_crop=64, p_audio_aug=0.2)
    item = prepare_item(video, audio, cfg, np.random.default_rng(0), "train")
    assert item["audio_full"].shape == (80_000,)  # 5 s crop at 16 kHz
    assert item["audio_seg_starts"].shape == (14,)
    seg = np.asarray(segment_pcm(jnp.asarray(item["audio_full"]),
                                 jnp.asarray(item["audio_seg_starts"]),
                                 item["audio"].shape[-1]))
    np.testing.assert_array_equal(seg, item["audio"])

    cfg0 = SyncPipelineConfig(n_segments=14, input_size=48,
                              size_before_crop=64, p_audio_aug=0.0)
    item0 = prepare_item(video, audio, cfg0, np.random.default_rng(0), "train")
    assert "audio_full" not in item0 and "audio_seg_starts" not in item0
    item_t = prepare_item(video, audio, cfg, np.random.default_rng(0), "test")
    assert "audio_full" not in item_t


def test_stage_sync_audio_aug_hook(rng):
    """Stage-II/III device preprocess honors p_audio_aug (ref:
    configs/sync.yaml:151-169): p=1 changes the mel input, p=0 is
    bit-identical to the no-hook path."""
    import jax

    from synchformer_tpu.train.stage_sync import _device_preprocess

    batch = {
        "video": jnp.asarray(rng.integers(0, 255, (2, 3, 4, 16, 16, 3),
                                          dtype=np.uint8)),
        "audio": jnp.asarray(rng.standard_normal((2, 3, 2560))
                             .astype(np.float32) * 0.1),
    }
    key = jax.random.PRNGKey(0)
    _, aud_off = _device_preprocess(batch, train=True, rng=key, p_flip=0.0)
    _, aud_p0 = _device_preprocess(batch, train=True, rng=key, p_flip=0.0,
                                   p_audio_aug=0.0)
    _, aud_p1 = _device_preprocess(batch, train=True, rng=key, p_flip=0.0,
                                   p_audio_aug=1.0)
    _, aud_eval = _device_preprocess(batch, train=False, rng=None, p_flip=0.0,
                                     p_audio_aug=1.0)
    np.testing.assert_array_equal(np.asarray(aud_p0), np.asarray(aud_off))
    assert not np.allclose(np.asarray(aud_p1), np.asarray(aud_off))
    # eval never augments
    np.testing.assert_array_equal(np.asarray(aud_eval), np.asarray(aud_off))

    # pre-segmentation path: when the loader ships the contiguous crop the
    # augs run on it and the segments are gathered on device
    starts = np.tile(np.array([0, 1280, 2560], np.int32), (2, 1))
    full = np.zeros((2, 5120), np.float32)
    aud_np = np.asarray(batch["audio"])
    full[:, :2560] = aud_np[:, 0]
    full[:, 1280:3840] = aud_np[:, 1]
    full[:, 2560:] = aud_np[:, 2]
    batch_full = dict(batch, audio_full=jnp.asarray(full),
                      audio_seg_starts=jnp.asarray(starts))
    _, aud_pre = _device_preprocess(batch_full, train=True, rng=key,
                                    p_flip=0.0, p_audio_aug=1.0)
    assert aud_pre.shape == aud_off.shape
    assert not np.allclose(np.asarray(aud_pre), np.asarray(aud_off))
