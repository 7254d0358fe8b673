"""Input-reconstruction viz: the inversion chain must approximately recover a
pure tone from its normalized log-mel (the reference's de-facto data-pipeline
integration test, ref: utils/logger.py:162-242)."""
import numpy as np

from synchformer_tpu.ops.mel import MelSpectrogramConfig, log_mel_spectrogram
from synchformer_tpu.utils.viz import (
    denormalize_ast,
    griffin_lim,
    inverse_mel,
    plot_per_class_accuracy,
    plot_similarity_matrices,
    save_input_reconstruction,
)

CFG = MelSpectrogramConfig()


def test_roundtrip_tone_reconstruction():
    import jax.numpy as jnp

    t = np.arange(10_240) / 16_000
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    spec = np.asarray(log_mel_spectrogram(jnp.asarray(tone), CFG))  # (128, 66)

    # invert: denorm -> exp -> inverse mel -> griffin-lim
    mel_log = denormalize_ast(spec)
    mel_power = np.maximum(np.exp(mel_log) - CFG.log_eps, 0.0)
    linear = inverse_mel(mel_power, CFG)
    wave = griffin_lim(linear, CFG, n_iter=24)

    # the reconstruction must be dominated by ~440 Hz
    spectrum = np.abs(np.fft.rfft(wave[: 10_240]))
    freqs = np.fft.rfftfreq(10_240, 1 / 16_000)
    peak = freqs[spectrum.argmax()]
    assert abs(peak - 440.0) < 30.0, peak


def test_save_input_reconstruction(tmp_path, rng):
    video = rng.integers(0, 255, (3, 4, 32, 32, 3), dtype=np.uint8)
    spec = rng.standard_normal((3, 66, 128)).astype(np.float32) * 0.1
    paths = save_input_reconstruction(video, spec, str(tmp_path), max_frames=3)
    for p in paths.values():
        assert (tmp_path / p.split("/")[-1]).exists()


def test_plots(tmp_path, rng):
    plot_per_class_accuracy({0: 0.5, 1: 0.7, "median": 0.6},
                            str(tmp_path / "acc.png"))
    plot_similarity_matrices(
        {"v2a": rng.standard_normal((8, 8)), "a2v": rng.standard_normal((8, 8))},
        str(tmp_path / "sims.png"))
    assert (tmp_path / "acc.png").exists()
    assert (tmp_path / "sims.png").exists()
