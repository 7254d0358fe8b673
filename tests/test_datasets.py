"""Dataset-catalog tests with synthetic metadata trees (no real media)."""
import csv
from pathlib import Path

import numpy as np

from synchformer_tpu.data.datasets import (
    LRS3,
    VGGSound,
    VGGSoundSparse,
    fixed_offsets_fname,
    subsample_dataset,
)
from synchformer_tpu.data.media import get_video_and_audio, synthetic_av


def _make_vggsound_tree(root: Path, n_classes=3, clips_per_class=6):
    vids = root / "vids"
    data = root / "data"
    (data / "filtered_examples_vggsound").mkdir(parents=True)
    vids.mkdir()
    rows = []
    i = 0
    for c in range(n_classes):
        for j in range(clips_per_class):
            vid = f"vid{i:07d}xxxx"[:11].ljust(11, "x")
            start = 1
            split = "test" if j >= clips_per_class - 2 else "train"
            rows.append([vid, str(start), f"class_{c}", split])
            (vids / f"{vid}_{start * 1000}_{(start + 10) * 1000}.mp4").touch()
            i += 1
    with open(data / "vggsound.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    # one bad example: first clip of class 0
    bad_id = f"{rows[0][0]}_1000_11000"
    (data / "filtered_examples_vggsound" / "bad.txt").write_text(bad_id + "\n")
    return vids, data, rows


def test_vggsound_split_generation(tmp_path):
    vids, data, rows = _make_vggsound_tree(tmp_path)
    ds = VGGSound("train", str(vids), splits_path=str(data),
                  meta_path=str(data / "vggsound.csv"),
                  load_fixed_offsets_on=[])
    # split files were generated
    for s in ("train", "valid", "test"):
        assert (data / f"vggsound_{s}.txt").exists()
    assert len(ds) > 0
    assert all(r.path.endswith(".mp4") for r in ds.records)
    assert len(ds.label2target) == 3
    # the bad example is filtered out
    assert not any(rows[0][0] in r.path for r in ds.records)
    # valid mirrors test-set class counts: each class held out 2 test clips
    ds_valid = VGGSound("valid", str(vids), splits_path=str(data),
                        meta_path=str(data / "vggsound.csv"),
                        load_fixed_offsets_on=[])
    ds_test = VGGSound("test", str(vids), splits_path=str(data),
                       meta_path=str(data / "vggsound.csv"),
                       load_fixed_offsets_on=[])
    assert len(ds_valid) > 0 and len(ds_test) > 0
    # train/valid/test partition the available clips
    all_paths = {r.path for r in ds.records} | {r.path for r in ds_valid.records} \
        | {r.path for r in ds_test.records}
    assert len(all_paths) == len(ds) + len(ds_valid) + len(ds_test)


def test_vggsound_fixed_offsets(tmp_path):
    vids, data, rows = _make_vggsound_tree(tmp_path)
    off_dir = data / "fixed_offsets_vggsound"
    off_dir.mkdir()
    # build the generated split first to learn test ids
    VGGSound("train", str(vids), splits_path=str(data),
             meta_path=str(data / "vggsound.csv"), load_fixed_offsets_on=[])
    test_ids = (data / "vggsound_test.txt").read_text().splitlines()
    fname = fixed_offsets_fname("test", 21, 5, -2.0, 2.0)
    with open(off_dir / fname, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "vstart_sec", "offset_sec"])
        for tid in test_ids:
            w.writerow([tid, "1.0", "1.6"])
    ds = VGGSound("test", str(vids), splits_path=str(data),
                  meta_path=str(data / "vggsound.csv"))
    assert all(r.fixed_offset is not None for r in ds.records)
    assert ds.records[0].fixed_offset["offset_sec"] == 1.6
    assert ds.records[0].fixed_offset["v_start_i_sec"] == 1.0


def test_vggsound_sparse_filters_classes(tmp_path):
    vids, data, rows = _make_vggsound_tree(tmp_path)
    with open(data / "sparse_classes.csv", "w", newline="") as f:
        csv.writer(f, delimiter="\t").writerows(
            [["class_0", "y"], ["class_1", "n"], ["class_2", "y"]])
    ds = VGGSoundSparse("train", str(vids), splits_path=str(data),
                        meta_path=str(data / "vggsound.csv"),
                        sparse_meta_path=str(data / "sparse_classes.csv"),
                        load_fixed_offsets_on=[])
    assert set(ds.label2target) == {"class_0", "class_2"}
    assert all(r.target in (0, 1) for r in ds.records)


def test_lrs3_speaker_disjoint_split(tmp_path):
    vids = tmp_path / "lrs"
    data = tmp_path / "data"
    data.mkdir()
    for spk in range(10):
        d = vids / "pretrain" / f"spk{spk:03d}"
        d.mkdir(parents=True)
        for c in range(3):
            (d / f"{c:05d}.mp4").touch()
    splits = {}
    for s in ("train", "valid", "test"):
        ds = LRS3(s, str(vids), splits_path=str(data), load_fixed_offsets_on=[])
        splits[s] = {Path(r.path).parent.name for r in ds.records}
        assert len(ds) > 0
    assert splits["train"] & splits["valid"] == set()
    assert splits["train"] & splits["test"] == set()
    assert splits["valid"] & splits["test"] == set()
    assert LRS3.max_clip_len_sec == 11


def test_subsample_dataset():
    items = list(range(100))
    out = subsample_dataset(items, 0.25, shuffle=True, seed=0)
    assert len(out) == 25
    assert subsample_dataset(items, None) is items
    assert len(subsample_dataset(items, 0.001)) == 1  # at least one example


def test_synthetic_media_backend():
    video, audio, meta = get_video_and_audio("nonexistent.mp4", backend="synthetic")
    assert video.dtype == np.uint8 and video.shape[1:] == (256, 256, 3)
    assert audio.dtype == np.float32
    assert meta["video"]["fps"] == [25.0]
    v2, a2, _ = synthetic_av(seed=1)
    assert not np.array_equal(video, v2)
