from synchformer_tpu.ops.mel import MelSpectrogramConfig, log_mel_spectrogram, mel_filterbank  # noqa: F401
