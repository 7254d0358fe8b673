"""Native avstage runtime: build, bind, match the numpy reference exactly."""
import numpy as np
import pytest

from synchformer_tpu.data import avstage


@pytest.fixture(scope="module")
def lib_available():
    ok = avstage.available()
    if not ok:
        pytest.skip("g++ unavailable; numpy fallback covered elsewhere")
    return ok


def test_gather_video_matches_numpy(lib_available, rng):
    video = rng.integers(0, 255, (60, 32, 40, 3), dtype=np.uint8)
    starts = np.array([0, 8, 16, 40], dtype=np.int64)
    out = avstage.gather_video_segments(video, starts, seg_len=16,
                                        crop_ij=(4, 6), crop_hw=(24, 24))
    idx = starts[:, None] + np.arange(16)[None]
    golden = video[idx][:, :, 4:28, 6:30]
    np.testing.assert_array_equal(out, golden)


def test_gather_audio_matches_numpy(lib_available, rng):
    audio = rng.standard_normal(50_000).astype(np.float32)
    starts = np.array([0, 5_120, 10_240], dtype=np.int64)
    out = avstage.gather_audio_segments(audio, starts, seg_len=10_240)
    idx = starts[:, None] + np.arange(10_240)[None]
    np.testing.assert_array_equal(out, audio[idx])


def test_pcm16_conversion(lib_available):
    pcm = np.array([-32768, -16384, 0, 16384, 32767], dtype=np.int16)
    out = avstage.pcm16_to_f32(pcm)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0, atol=1e-7)
    # stereo downmix
    stereo = np.array([0, 32767, -32768, 0], dtype=np.int16)  # frames: (L,R)
    out2 = avstage.pcm16_to_f32(stereo, channels=2)
    np.testing.assert_allclose(
        out2, [(0 + 32767) / 2 / 32768.0, (-32768 + 0) / 2 / 32768.0], atol=1e-6)


def test_fallback_paths(monkeypatch, rng):
    """With the native lib masked out, the numpy fallback must agree."""
    monkeypatch.setattr(avstage, "_load", lambda: None)
    video = rng.integers(0, 255, (30, 16, 16, 3), dtype=np.uint8)
    starts = np.array([0, 4], dtype=np.int64)
    out = avstage.gather_video_segments(video, starts, 8, (0, 0), (16, 16))
    idx = starts[:, None] + np.arange(8)[None]
    np.testing.assert_array_equal(out, video[idx])


def test_patchify_u8_matches_reference(rng):
    """Native host-side im2col == ops.video.patchify_frames, and the numpy
    fallback path too (the dense patch embed depends on this byte order)."""
    from synchformer_tpu.ops.video import patchify_frames

    x = rng.integers(0, 256, (3, 2, 4, 32, 32, 3), dtype=np.uint8)
    ref = patchify_frames(x, z_block=2, patch=16)
    out = avstage.patchify_u8(x, z_block=2, patch=16)
    np.testing.assert_array_equal(out, ref)
    assert out.shape == (3, 2, 2, 4, 2 * 16 * 16 * 3)

    # out= reuse (staging slots)
    buf = np.empty_like(out)
    out2 = avstage.patchify_u8(x, z_block=2, patch=16, out=buf)
    assert out2 is buf
    np.testing.assert_array_equal(buf, ref)


def test_patchify_u8_fallback(monkeypatch, rng):
    from synchformer_tpu.ops.video import patchify_frames

    monkeypatch.setattr(avstage, "_load", lambda: None)
    x = rng.integers(0, 256, (2, 4, 32, 32, 3), dtype=np.uint8)
    np.testing.assert_array_equal(avstage.patchify_u8(x, patch=16),
                                  patchify_frames(x, patch=16))
