"""Input pipeline: sampler sharding semantics + loader batch contract."""
import numpy as np

from synchformer_tpu.data.datasets import SyntheticAV
from synchformer_tpu.data.pipeline import EpochSampler, SyncDataLoader
from synchformer_tpu.data.transforms import SyncPipelineConfig


def test_epoch_sampler_process_sharding():
    """DistributedSampler parity: per-process slices are disjoint, cover the
    (truncated) dataset, and reshuffle per epoch."""
    n, procs = 103, 4
    samplers = [EpochSampler(n, shuffle=True, seed=7, process_index=i,
                             process_count=procs) for i in range(procs)]
    all_idx = np.concatenate([s.indices(epoch=3) for s in samplers])
    assert len(all_idx) == (n // procs) * procs  # drop_last
    assert len(set(all_idx.tolist())) == len(all_idx)  # disjoint
    # deterministic per (seed, epoch); different across epochs
    np.testing.assert_array_equal(samplers[0].indices(3), samplers[0].indices(3))
    assert not np.array_equal(samplers[0].indices(3), samplers[0].indices(4))
    # no shuffle -> sorted order
    plain = EpochSampler(n, shuffle=False, process_index=0, process_count=1)
    np.testing.assert_array_equal(plain.indices(0), np.arange(n))


def test_loader_batch_contract():
    cfg = SyncPipelineConfig(n_segments=3, crop_len_sec=1.0, input_size=32,
                             segment_size_vframes=4, audio_jitter_sec=0.0)
    ds = SyntheticAV("train", n_clips=8)
    loader = SyncDataLoader(ds, cfg, batch_size=4, num_workers=2, seed=0,
                            decode_backend="synthetic")
    batches = list(loader)
    assert len(batches) == 2
    for batch in batches:
        assert batch["video"].shape == (4, 3, 4, 32, 32, 3)
        assert batch["video"].dtype == np.uint8
        assert batch["audio"].shape == (4, 3, 2560)
        assert batch["audio"].dtype == np.float32
        assert batch["offset_target"].shape == (4,)
    # epoch reshuffling changes item order
    loader.set_epoch(1)
    batches2 = list(loader)
    assert not np.array_equal(batches[0]["index"], batches2[0]["index"])


def test_loader_eval_split_deterministic():
    cfg = SyncPipelineConfig(n_segments=3, crop_len_sec=1.0, input_size=32,
                             segment_size_vframes=4, audio_jitter_sec=0.0,
                             is_spatial_crop_random=False,
                             is_temporal_crop_random=False)
    ds = SyntheticAV("valid", n_clips=4)
    loader = SyncDataLoader(ds, cfg, batch_size=4, num_workers=2, seed=0,
                            shuffle=False, decode_backend="synthetic")
    b1 = next(iter(loader))
    b2 = next(iter(loader))
    np.testing.assert_array_equal(b1["video"], b2["video"])
    np.testing.assert_array_equal(b1["offset_target"], b2["offset_target"])


def test_measure_pipeline_throughput_overlap():
    """Loader-overlap accounting (bench.py --pipeline): every real clip is
    counted once, and with a slow consumer the prefetching loader overlaps
    production so the run is consumer-bound (low host-wait fraction)."""
    import time

    from synchformer_tpu.data.pipeline import measure_pipeline_throughput

    cfg = SyncPipelineConfig(n_segments=2, crop_len_sec=1.0, input_size=32,
                             segment_size_vframes=4, audio_jitter_sec=0.0)
    ds = SyntheticAV("test", n_clips=6)
    loader = SyncDataLoader(ds, cfg, batch_size=4, num_workers=2, seed=0,
                            shuffle=False, drop_last=False,
                            decode_backend="synthetic")
    # warm pass: populate the synthetic decode cache (the bench does the same)
    for _ in loader:
        pass

    seen = []

    def consume(batch):
        time.sleep(0.15)  # a consumer slower than the (cached) producer
        seen.append(int(batch["pad_mask"].sum()))

    stats = measure_pipeline_throughput(loader, consume, epochs=2)
    assert stats["clips"] == 12            # 6 real clips x 2 epochs, no dups
    assert sum(seen) == 12
    assert 0.0 <= stats["host_wait_frac"] <= 1.0
    assert stats["clips_per_sec"] > 0
    # consumer-bound: the loader produced batches while consume slept
    assert stats["host_wait_frac"] < 0.6


def test_staged_loader_double_buffers_h2d():
    """StagedLoader (bench.py pipeline path): device-bound keys arrive as
    committed jax arrays, other keys pass through untouched, order is
    preserved, stats accumulate, and staging runs ahead of a slow consumer
    (the double-buffering that overlaps H2D with compute, VERDICT r4 #3)."""
    import time

    import jax

    from synchformer_tpu.data.pipeline import StagedLoader

    batches = [{"video": np.full((2, 3), i, np.uint8),
                "audio": np.ones((2, 4), np.float32),
                "index": np.arange(2) + i} for i in range(4)]

    class StubLoader:
        def __init__(self):
            self.epoch = None

        def set_epoch(self, e):
            self.epoch = e

        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter(batches)

    stub = StubLoader()
    staged = StagedLoader(stub, depth=2)
    staged.set_epoch(3)
    assert stub.epoch == 3 and len(staged) == 4

    seen = []
    for b in staged:
        assert isinstance(b["video"], jax.Array)
        assert isinstance(b["audio"], jax.Array)
        assert isinstance(b["index"], np.ndarray)  # not a device key
        seen.append(int(np.asarray(b["video"])[0, 0]))
        time.sleep(0.02)  # slow consumer: stager fills its slots meanwhile
    assert seen == [0, 1, 2, 3]
    assert staged.h2d_bytes == sum(b["video"].nbytes + b["audio"].nbytes
                                   for b in batches)
    assert staged.h2d_s > 0
    staged.reset_stats()
    assert staged.h2d_s == 0.0 and staged.h2d_bytes == 0
    # the source batches were not mutated (StagedLoader copies the dict)
    assert isinstance(batches[0]["video"], np.ndarray)


def test_staged_loader_propagates_producer_errors():
    from synchformer_tpu.data.pipeline import StagedLoader

    class BadLoader:
        def __iter__(self):
            yield {"video": np.zeros((1,), np.uint8)}
            raise RuntimeError("decode exploded")

    import pytest

    with pytest.raises(RuntimeError, match="decode exploded"):
        for _ in StagedLoader(BadLoader(), depth=1):
            pass


def test_local_clips_cycles_paths():
    from synchformer_tpu.data.datasets import LocalClips

    ds = LocalClips(["/a.mp4", "/b.mp4"], "test", n_clips=5)
    assert len(ds) == 5
    assert [r.path for r in ds.records] == \
        ["/a.mp4", "/b.mp4", "/a.mp4", "/b.mp4", "/a.mp4"]
    assert ds.split == "test" and ds.max_clip_len_sec is None

    import pytest

    with pytest.raises(ValueError):
        LocalClips([], "test")


def test_staged_loader_host_transform():
    """host_transform (bench.py: avstage.patchify_u8 of the video key) runs
    in the staging thread before device_put."""
    import jax

    from synchformer_tpu.data.pipeline import StagedLoader

    batches = [{"video": np.full((4, 4), i, np.uint8)} for i in range(3)]

    class StubLoader:
        def set_epoch(self, e):
            pass

        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter(batches)

    def xf(b):
        b["video"] = b["video"].reshape(2, 8) + 1
        return b

    got = list(StagedLoader(StubLoader(), depth=2, host_transform=xf))
    assert [b["video"].shape for b in got] == [(2, 8)] * 3
    assert all(isinstance(b["video"], jax.Array) for b in got)
    np.testing.assert_array_equal(np.asarray(got[0]["video"]),
                                  np.full((2, 8), 1, np.uint8))
