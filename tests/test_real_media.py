"""First real-media integration tests: the reference's published mp4s
through decode -> host geometry -> device transforms -> towers.

Every other decoder test in the repo mocks the decode boundary; these use
the actual h264 clips the reference ships (ref: README.md:73-82 names
3qesirWAGt4_20000_30000.mp4 as the example-output clip;
dataset/dataset_utils.py:75-85 is the decode the cv2 backend replaces).
OpenCV decodes the video track only — AAC audio has no in-image decoder
(no soundfile/librosa/torchaudio), so the PCM side is zero-filled with a
warning and the assertions stop at "shapes/stats are right and the model
runs", not published-logit parity (that needs the published checkpoint,
which zero egress blocks — VERDICT r4 missing #2).
"""
from pathlib import Path

import numpy as np
import pytest

from synchformer_tpu.data.media import available_backends, get_video_and_audio

VGG_CLIP = Path("/root/reference/data/vggsound/"
                "h264_video_25fps_256side_16000hz_aac/3qesirWAGt4_20000_30000.mp4")
LRS_CLIP = Path("/root/reference/data/lrs3/"
                "h264_uncropped_25fps_256side_16000hz_aac/pretrain/"
                "C8zY0oAdQrs/00018.mp4")

needs_clips = pytest.mark.skipif(
    not (VGG_CLIP.exists() and LRS_CLIP.exists()),
    reason="reference sample clips not present")
needs_cv2 = pytest.mark.skipif("cv2" not in available_backends(),
                               reason="cv2 not installed")
pytestmark = [needs_clips, needs_cv2]


def test_cv2_backend_registered_before_synthetic():
    backends = available_backends()
    assert "cv2" in backends
    assert backends.index("cv2") < backends.index("synthetic")


def test_cv2_decodes_vggsound_clip(caplog):
    import logging

    with caplog.at_level(logging.WARNING):
        video, audio, meta = get_video_and_audio(str(VGG_CLIP), backend="cv2")
    # 10 s @ 25 fps, 256-side (ref README.md:73-82 publishes this clip)
    assert video.shape == (250, 256, 454, 3) and video.dtype == np.uint8
    assert meta["video"]["fps"] == [25.0]
    # frames are real content, not a solid color
    assert video.std() > 10.0
    assert not np.array_equal(video[0], video[100])
    # audio is honest about being undecodable: zero PCM + loud warning
    assert audio.dtype == np.float32 and np.all(audio == 0.0)
    assert audio.shape == (int(250 / 25.0 * 16_000),)
    assert any("VIDEO ONLY" in r.message for r in caplog.records)


def test_cv2_decodes_lrs3_clip():
    video, audio, meta = get_video_and_audio(str(LRS_CLIP), backend="cv2")
    assert video.shape == (393, 256, 454, 3) and video.dtype == np.uint8
    assert meta["video"]["fps"] == [25.0]
    assert len(audio) == int(393 / 25.0 * 16_000)


def test_cv2_end_sec_truncates():
    video, audio, _ = get_video_and_audio(str(VGG_CLIP), backend="cv2",
                                          end_sec=2.0)
    assert 50 <= len(video) <= 51  # 2 s @ 25 fps (+1 frame guard)
    assert len(audio) == int(len(video) / 25.0 * 16_000)


def test_real_frames_through_host_geometry():
    """Deterministic test transform at the reference example's +1.6 s offset
    (ref: example.py:50-66; expected target class 18 on the 21-class grid)."""
    from synchformer_tpu.data.transforms import SyncPipelineConfig, prepare_item

    video, audio, _ = get_video_and_audio(str(VGG_CLIP), backend="cv2")
    cfg = SyncPipelineConfig()  # full-size: S=14, 224^2, 5 s crop
    item = prepare_item(video, audio, cfg, np.random.default_rng(0),
                        split="test", fixed_offset_sec=1.6,
                        fixed_v_start_sec=0.0)
    assert item["video"].shape == (14, 16, 224, 224, 3)
    assert item["video"].dtype == np.uint8
    assert item["audio"].shape == (14, 10240)
    assert int(item["offset_target"]) == 18
    assert float(item["offset_sec"]) == pytest.approx(1.6)
    # the crop kept real pixels (center crop of real frames, not padding)
    assert item["video"].std() > 10.0


def test_real_frames_through_device_transforms_and_vis_tower():
    """Real pixels -> device normalize -> full-size Motionformer (depth 12,
    d=768) on one segment. The first time real media reaches the tower."""
    import jax
    import jax.numpy as jnp

    from synchformer_tpu.data.transforms import SyncPipelineConfig, prepare_item
    from synchformer_tpu.models.presets import motionformer_cfg
    from synchformer_tpu.ops.video import prepare_video_batch
    from synchformer_tpu.registry import instantiate_from_config

    video, audio, _ = get_video_and_audio(str(VGG_CLIP), backend="cv2")
    item = prepare_item(video, audio, SyncPipelineConfig(),
                        np.random.default_rng(0), split="test",
                        fixed_offset_sec=0.0, fixed_v_start_sec=0.0)
    seg = jnp.asarray(item["video"][None, :1])     # (1, 1, 16, 224, 224, 3)

    vis = prepare_video_batch(seg, train=False, dtype=jnp.float32)
    v = np.asarray(vis)
    # ImageNet-normalized real frames: roughly centered, plausible spread
    assert np.isfinite(v).all()
    assert -3.0 < v.mean() < 3.0 and 0.1 < v.std() < 3.0

    model = instantiate_from_config(motionformer_cfg())
    params = model.init(jax.random.PRNGKey(0), vis)
    # fresh init is input-INDEPENDENT by design: the reference zero-inits the
    # 3D patch conv (weights come from an inflated 2D ckpt, ref:
    # video_model_builder.py:61) — randomize so real pixels actually flow
    noise = np.random.default_rng(1)
    params = jax.tree.map(
        lambda p: p + (0.02 * noise.standard_normal(p.shape)).astype(p.dtype),
        params)
    feats, _ = jax.jit(model.apply)(params, vis)
    feats = np.asarray(feats)
    assert feats.shape == (1, 1, 8, 768)
    assert np.isfinite(feats).all()
    # different real segments produce different features
    seg2 = jnp.asarray(item["video"][None, 7:8])
    feats2, _ = jax.jit(model.apply)(
        params, prepare_video_batch(seg2, train=False, dtype=jnp.float32))
    feats2 = np.asarray(feats2)
    assert np.abs(feats - feats2).max() > 1e-3


@pytest.mark.slow
def test_example_path_on_real_mp4_end_to_end():
    """example.py's inference path on the real clip, as far as audio allows:
    cv2 decode -> test transform at +1.6 s -> jitted full forward (device mel
    front-end on the zero PCM + both towers + sync head) -> finite logits.
    Uses a reduced S=2 model (the published checkpoint is egress-blocked, so
    weights are random and published-logit parity is out of scope —
    ref: example.py:104-115, README.md:73-97)."""
    import jax
    import jax.numpy as jnp

    from synchformer_tpu.data.transforms import (
        SyncPipelineConfig,
        make_class_grid,
        prepare_item,
    )
    from synchformer_tpu.models.presets import build_synchformer
    from synchformer_tpu.ops.mel import log_mel_spectrogram
    from synchformer_tpu.ops.video import prepare_video_batch

    n_seg = 2
    video, audio, _ = get_video_and_audio(str(VGG_CLIP), backend="cv2")
    cfg = SyncPipelineConfig(n_segments=n_seg, crop_len_sec=1.0)
    item = prepare_item(video, audio, cfg, np.random.default_rng(0),
                        split="test", fixed_offset_sec=1.6,
                        fixed_v_start_sec=0.0)
    assert item["video"].shape == (n_seg, 16, 224, 224, 3)

    model = build_synchformer(n_segments=n_seg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, n_seg, 16, 224, 224, 3)),
                        jnp.zeros((1, n_seg, 66, 128)))
    # the vis patch conv is zero-init by reference parity (ref:
    # video_model_builder.py:61) — randomize so the real pixels matter
    noise = np.random.default_rng(1)
    params = jax.tree.map(
        lambda p: p + (0.02 * noise.standard_normal(p.shape)).astype(p.dtype),
        params)

    @jax.jit
    def infer(params, video_u8, pcm):
        vis = prepare_video_batch(video_u8[None], train=False,
                                  dtype=jnp.float32)
        mel = log_mel_spectrogram(pcm[None])
        aud = jnp.swapaxes(mel, -1, -2)
        _, logits = model.apply(params, vis, aud)
        return logits[0].astype(jnp.float32)

    logits = np.asarray(infer(params, jnp.asarray(item["video"]),
                              jnp.asarray(item["audio"])))
    grid = make_class_grid(-2.0, 2.0, 21)
    assert logits.shape == (21,) and np.isfinite(logits).all()
    assert grid[int(item["offset_target"])] == pytest.approx(1.6)
