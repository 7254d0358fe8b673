"""Tests for the host-side geometry pipeline against the reference's math
(grid/quantization values from configs/sync.yaml + SURVEY.md §0 table)."""
import numpy as np
import pytest

from synchformer_tpu.data.transforms import (
    SyncPipelineConfig,
    equalify_from_right,
    gather_segments,
    make_class_grid,
    prepare_item,
    quantize_offset,
    sample_syncability_crop,
    sample_temporal_crop_and_offset,
    segment_ranges,
)


def test_class_grid_canonical():
    grid = make_class_grid(-2.0, 2.0, 21)
    assert grid.shape == (21,)
    np.testing.assert_allclose(grid, np.arange(-2.0, 2.01, 0.2), atol=1e-6)
    # extreme offset class for syncability-style grids
    grid_ext = make_class_grid(-2.0, 2.0, 21, add_extreme_offset=True,
                               seg_size_vframes=16, nseg=14, step_size_seg=0.5,
                               vfps=25)
    assert grid_ext.shape == (22,)
    np.testing.assert_allclose(grid_ext[-1], 7.5 * 0.64, atol=1e-6)


def test_quantize_offset():
    grid = make_class_grid(-2.0, 2.0, 21)
    assert quantize_offset(grid, 1.6) == (pytest.approx(1.6, abs=1e-6), 18)
    assert quantize_offset(grid, -2.0) == (pytest.approx(-2.0), 0)
    assert quantize_offset(grid, 0.09) == (pytest.approx(0.0, abs=1e-6), 10)
    assert quantize_offset(grid, 0.11) == (pytest.approx(0.2, abs=1e-6), 11)


def test_equalify_from_right():
    # 10.5s of video at 25fps, 9.7s of audio at 16kHz -> min(9.7, 10) sec
    v, a = equalify_from_right(262, 155_200, 25, 16_000, 10)
    assert v == int(25 * 9.7)
    assert a == (16_000 // 25) * v


def test_segment_ranges_canonical():
    """S=14, stride 0.5 over a 5 s crop: 120 video frames / 76800 audio
    samples of coverage (SURVEY.md geometry table)."""
    rng = np.random.default_rng(0)
    v_ranges, a_ranges = segment_ranges(125, 80_000, 25, 16_000, 16, 14, 0.5,
                                        is_start_random=False, rng=rng)
    assert v_ranges.shape == (14, 2) and a_ranges.shape == (14, 2)
    assert (v_ranges[:, 1] - v_ranges[:, 0] == 16).all()
    assert (a_ranges[:, 1] - a_ranges[:, 0] == 10_240).all()
    assert (np.diff(v_ranges[:, 0]) == 8).all()      # 50% overlap
    assert (np.diff(a_ranges[:, 0]) == 5_120).all()
    # center crop: (125 - 120) // 2 = 2
    assert v_ranges[0, 0] == 2
    assert v_ranges[-1, 1] <= 125 and a_ranges[-1, 1] <= 80_000


def test_gather_segments_shapes(rng):
    video = rng.integers(0, 255, (125, 8, 8, 3), dtype=np.uint8)
    audio = rng.standard_normal(80_000).astype(np.float32)
    v_r, a_r = segment_ranges(125, 80_000, 25, 16_000, 16, 14, 0.5, False,
                              np.random.default_rng(0))
    vs, aus = gather_segments(video, audio, v_r, a_r)
    assert vs.shape == (14, 16, 8, 8, 3)
    assert aus.shape == (14, 10_240)
    np.testing.assert_array_equal(vs[0], video[v_r[0, 0]:v_r[0, 1]])
    np.testing.assert_array_equal(aus[3], audio[a_r[3, 0]:a_r[3, 1]])


def test_temporal_crop_fixed_offset():
    """Fixed-offset path (valid/test): audio starts at v_start + offset."""
    grid = make_class_grid(-2.0, 2.0, 21)
    crop = sample_temporal_crop_and_offset(
        250, 160_000, 25, 16_000, 5.0, grid, np.random.default_rng(0),
        fixed_offset_sec=1.6, fixed_v_start_sec=1.0, max_a_jitter_sec=0.0)
    assert crop.offset_target == 18
    assert crop.v_start_i == 25
    assert crop.a_start_i == int((1.0 + 1.6) * 16_000)
    assert crop.v_len == 125 and crop.a_len == 80_000


def test_temporal_crop_sampled_bounds():
    """Sampled offsets always leave both crops in-bounds."""
    grid = make_class_grid(-2.0, 2.0, 21)
    for seed in range(50):
        rng = np.random.default_rng(seed)
        crop = sample_temporal_crop_and_offset(
            250, 160_000, 25, 16_000, 5.0, grid, rng, max_a_jitter_sec=0.05)
        assert 0 <= crop.v_start_i <= 250 - crop.v_len
        assert 0 <= crop.a_start_i <= 160_000 - crop.a_len
        assert crop.offset_target is not None
        np.testing.assert_allclose(grid[crop.offset_target], crop.offset_sec,
                                   atol=0.011)


def test_syncability_crop():
    """S=13 segments -> crop 4.48 s; non-syncable uses ±crop_len offset."""
    grid = make_class_grid(-2.0, 2.0, 21)
    seen_sync = set()
    for seed in range(40):
        rng = np.random.default_rng(seed)
        crop = sample_syncability_crop(
            300, 192_000, 25, 16_000, grid, rng, n_segments=13)
        assert crop.v_len == int(25 * 4.48)
        seen_sync.add(crop.sync_target)
        if crop.sync_target == 0:
            assert abs(crop.offset_sec) == pytest.approx(4.48)
        else:
            assert -2.0 <= crop.offset_sec <= 2.0
    assert seen_sync == {0, 1}


def test_prepare_item_end_to_end(rng):
    video = rng.integers(0, 255, (250, 256, 256, 3), dtype=np.uint8)
    audio = rng.standard_normal(160_000).astype(np.float32)
    cfg = SyncPipelineConfig()
    out = prepare_item(video, audio, cfg, np.random.default_rng(1), split="train")
    assert out["video"].shape == (14, 16, 224, 224, 3)
    assert out["video"].dtype == np.uint8
    assert out["audio"].shape == (14, 10_240)
    assert 0 <= int(out["offset_target"]) < 21

    # test split with fixed offsets (the evaluation protocol)
    out2 = prepare_item(video, audio, cfg, np.random.default_rng(2), split="test",
                        fixed_offset_sec=-2.0, fixed_v_start_sec=4.0)
    assert int(out2["offset_target"]) == 0
    assert float(out2["offset_sec"]) == pytest.approx(-2.0)


def test_prepare_item_syncability(rng):
    video = rng.integers(0, 255, (250, 256, 256, 3), dtype=np.uint8)
    audio = rng.standard_normal(160_000).astype(np.float32)
    cfg = SyncPipelineConfig(n_segments=13, for_syncability=True)
    out = prepare_item(video, audio, cfg, np.random.default_rng(3), split="train")
    assert out["video"].shape == (13, 16, 224, 224, 3)
    assert "sync_target" in out


def test_bilinear_resize_u8(rng):
    from synchformer_tpu.data.transforms import bilinear_resize_u8

    frames = rng.integers(0, 255, (3, 16, 16, 3), dtype=np.uint8)
    out = bilinear_resize_u8(frames, (32, 32))
    assert out.shape == (3, 32, 32, 3) and out.dtype == np.uint8
    # constant image stays constant under resize
    const = np.full((2, 8, 8, 3), 77, dtype=np.uint8)
    np.testing.assert_array_equal(bilinear_resize_u8(const, (24, 24)), 77)


def test_prepare_item_sometimes_upscale(rng):
    """With sometimes_upscale_p=1 the crop is taken at smaller_input_size and
    upscaled back (RGBSpatialCropSometimesUpscale, ref: transforms.py:110-137)."""
    video = rng.integers(0, 255, (250, 256, 256, 3), dtype=np.uint8)
    audio = rng.standard_normal(160_000).astype(np.float32)
    cfg = SyncPipelineConfig(sometimes_upscale_p=1.0, smaller_input_size=192)
    out = prepare_item(video, audio, cfg, np.random.default_rng(0), split="train")
    assert out["video"].shape == (14, 16, 224, 224, 3)  # fixed output shape
    # the upscaled frames are smoother than a direct crop: interpolation
    # introduces non-source values; just assert dtype/shape + determinism here
    out2 = prepare_item(video, audio, cfg, np.random.default_rng(0), split="train")
    np.testing.assert_array_equal(out["video"], out2["video"])


def test_resample_rgb_by_index():
    from synchformer_tpu.data.transforms import resample_rgb_by_index

    video = np.arange(30, dtype=np.uint8)[:, None, None, None] * np.ones(
        (1, 4, 4, 3), dtype=np.uint8)
    out = resample_rgb_by_index(video, orig_fps=30, new_fps=25)
    assert out.shape[0] == 25
    assert out[0, 0, 0, 0] == 0 and out[-1, 0, 0, 0] >= 27


def test_resize_and_letterbox_pad(rng):
    from synchformer_tpu.data.transforms import resize_and_letterbox_pad

    wide = rng.integers(1, 255, (2, 90, 160, 3), dtype=np.uint8)
    out = resize_and_letterbox_pad(wide, 128, 128)
    assert out.shape == (2, 128, 128, 3)
    assert (out[:, 0] == 0).all() and (out[:, -1] == 0).all()  # letterbox bars
    assert out[:, 64].max() > 0

    tall = rng.integers(1, 255, (2, 160, 90, 3), dtype=np.uint8)
    out2 = resize_and_letterbox_pad(tall, 128, 128)
    assert (out2[:, :, 0] == 0).all() and (out2[:, :, -1] == 0).all()
