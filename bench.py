"""Benchmark: end-to-end sync inference throughput on the real TPU chip.

Measures clips/sec/chip for the flagship Synchformer pipeline — raw PCM ->
device log-mel front-end -> AST + Motionformer towers -> cross-modal
transformer -> offset softmax — at full size (S=14 segments, 224x224x16
frames, bf16 compute).

Prints ONE JSON line. ``vs_baseline`` is the speedup over the CPU baseline
(the reference runs its whole pipeline on CPU/GPU per dataloader-worker +
GPU towers; BASELINE.json's north star is >10x clips/sec/chip over the CPU
baseline). The CPU baseline constant below was measured on this machine with
the identical JAX pipeline in fp32 on the host CPU (see git history for the
probe script).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# identical pipeline, JAX on host CPU, fp32, B=1 (measured on this machine:
# 81.2 s/clip -> 0.0123 clips/s)
CPU_BASELINE_CLIPS_PER_SEC = 0.0123

_PROBE = ("import jax, jax.numpy as jnp, numpy as np; "
          "print(float(np.asarray(jnp.sum(jnp.ones((8, 8))))))")


def wait_for_tpu(attempts: int = 30, probe_timeout: int = 120,
                 sleep_between: int = 60) -> None:
    """Block until the axon TPU tunnel answers a tiny computation.

    The tunnel intermittently drops (backend-init RuntimeError or an
    indefinite hang inside the PJRT client), so the probe runs in a
    subprocess with a hard timeout and retries with backoff instead of
    letting the bench process itself wedge.
    """
    for i in range(attempts):
        try:
            subprocess.run([sys.executable, "-c", _PROBE], check=True,
                           timeout=probe_timeout, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if i == attempts - 1:
                raise RuntimeError(
                    "TPU backend unreachable after %d probe attempts" % attempts)
            time.sleep(sleep_between)


def _build_model_and_infer(batch: int, n_seg: int):
    import jax
    import jax.numpy as jnp

    from synchformer_tpu.models.presets import build_synchformer
    from synchformer_tpu.ops.mel import log_mel_spectrogram
    from synchformer_tpu.ops.video import fold_video_normalize

    model = build_synchformer(n_segments=n_seg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((batch, n_seg, 16, 224, 224, 3)),
                             jnp.zeros((batch, n_seg, 66, 128))),
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes)
    # production eval path: patch-major uint8 video + raw PCM in. The video
    # normalization affine is constant-folded into the patchify conv weights
    # (ops/video.py::fold_video_normalize; 342.3 -> 339.0 ms/iter), and the
    # frames arrive pre-patchified from the loader (avstage.patchify_u8 in
    # the staging thread — a ~0.12 s/batch byte shuffle that overlaps device
    # compute), so the 3D patch conv becomes one dense MXU matmul: no
    # batch-in-sublanes input relayout, no strided-window fusion
    # (339.0 -> 333.7 ms/iter measured; see CLAUDE.md round-5 findings)
    params = fold_video_normalize(params)

    @jax.jit
    def infer(params, video_u8_patches, pcm):
        mel = log_mel_spectrogram(pcm)           # (B, S, 128, 66)
        aud = jnp.swapaxes(mel, -1, -2).astype(jnp.bfloat16)
        _, logits = model.apply(params, video_u8_patches, aud)
        return jax.nn.softmax(logits.astype(jnp.float32), -1)

    return params, infer, infer


def measure_device_only(params, infer, batch: int, n_seg: int) -> float:
    import jax.numpy as jnp

    from synchformer_tpu.data.avstage import patchify_u8

    rng = np.random.default_rng(0)
    vis = jnp.asarray(patchify_u8(
        rng.integers(0, 256, (batch, n_seg, 16, 224, 224, 3), dtype=np.uint8)))
    pcm = jnp.asarray((rng.standard_normal((batch, n_seg, 10240)) * 0.1).astype(np.float32))
    # compile + warmup (force sync via host transfer: the axon platform's
    # block_until_ready does not wait for remote completion)
    t0 = time.perf_counter()
    np.asarray(infer(params, vis, pcm))
    print(f"[bench] device-only compile+warmup {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    # best sustained window (same methodology as all rounds); 5 windows
    # because the axon tunnel's minute-scale state adds ~1.5% run-to-run
    # spread on top of the device time
    n_iter = 10
    best = float("inf")
    for r in range(5):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = infer(params, vis, pcm)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
        print(f"[bench] device-only round {r}: {best / n_iter * 1000:.0f} ms/iter",
              file=sys.stderr, flush=True)
    return batch * n_iter / best


# the two sample clips the reference publishes example outputs for
# (ref: README.md:73-97) — the real-decode pipeline bench loops them
REAL_CLIPS = [
    "/root/reference/data/vggsound/h264_video_25fps_256side_16000hz_aac/3qesirWAGt4_20000_30000.mp4",
    "/root/reference/data/vggsound/h264_video_25fps_256side_16000hz_aac/ZYc410CE4Rg_0_10000.mp4",
]


def measure_pipeline(params, infer_raw, batch: int, n_seg: int,
                     num_workers: int = 10, epochs: int = 2,
                     n_clips: int = 64, decode: str = "synthetic") -> dict:
    """Sustained host->device throughput: decode -> host geometry + avstage
    gather -> double-buffered H2D staging -> jitted step, overlapped.

    decode='synthetic' serves cached generated clips (decode-cache-steady —
    the loader wall is pure geometry); decode='cv2' loops the reference's
    two real mp4s through OpenCV so real decode cost is in the loop
    (VERDICT r4 task #7). H2D runs in the StagedLoader's staging thread,
    double-buffered, so transfer of batch k+1 overlaps the step of batch k
    (VERDICT r4 task #3; SURVEY §7 hard part 4); h2d_frac reports the
    staging thread's busy fraction — overlapped, no longer added to the
    critical path."""
    from synchformer_tpu.data.datasets import LocalClips, SyntheticAV
    from synchformer_tpu.data.pipeline import (
        StagedLoader,
        SyncDataLoader,
        measure_pipeline_throughput,
    )
    from synchformer_tpu.data.transforms import SyncPipelineConfig

    cfg = SyncPipelineConfig(n_segments=n_seg)  # full size: 224^2, crop 5 s
    if decode == "cv2":
        ds = LocalClips(REAL_CLIPS, "test", n_clips=n_clips)
    else:
        ds = SyntheticAV("test", n_clips=n_clips)
    from synchformer_tpu.data.avstage import patchify_u8

    def to_patch_major(b):
        # dense-patch-embed input format (see _build_model_and_infer); runs
        # in the staging thread, overlapped with device compute
        b["video"] = patchify_u8(b["video"])
        return b

    loader = StagedLoader(
        SyncDataLoader(ds, cfg, batch, num_workers=num_workers,
                       shuffle=False, decode_backend=decode, prefetch=4),
        depth=2, host_transform=to_patch_major)

    last = {}

    def consume(b):
        # arrays are already on device (StagedLoader staged them in its own
        # thread); this only dispatches the async step
        last["out"] = infer_raw(params, b["video"], b["audio"])

    def sync():
        np.asarray(last["out"])

    # warm epoch: decode cache + compile + H2D path
    t0 = time.perf_counter()
    for b in loader:
        consume(b)
    sync()
    print(f"[bench] pipeline warm epoch {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    loader.reset_stats()
    stats = measure_pipeline_throughput(loader, consume, epochs=epochs,
                                        sync=sync)
    stats["h2d_frac"] = loader.h2d_s / stats["total_s"]
    stats["h2d_mb_per_s"] = (loader.h2d_bytes / 1e6 / loader.h2d_s
                             if loader.h2d_s > 0 else 0.0)
    return stats


def measure_train_steps() -> dict:
    """Best-of-3 Stage-I / Stage-II train-step timing (VERDICT r4 task #4:
    train perf must live in the bench record, not CLAUDE.md prose — the
    reference meters its train step every iter, ref:
    scripts/train_sync.py:219-228)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "scripts"))
    import profile_tpu

    out = {}
    for mode, batch, key in (("stage1", 2, "stage1"), ("stage2", 16, "stage2")):
        run, (_, b) = getattr(profile_tpu, f"build_{mode}")(batch)
        profile_tpu._sync(run())  # compile + warm
        n_iter = 5
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                o = run()
            profile_tpu._sync(o)
            best = min(best, time.perf_counter() - t0)
        out[f"{key}_step_ms"] = round(best / n_iter * 1000, 1)
        out[f"{key}_samples_per_sec"] = round(b * n_iter / best, 2)
        print(f"[bench] {key}: {out[f'{key}_step_ms']} ms/step "
              f"({out[f'{key}_samples_per_sec']} samples/s)",
              file=sys.stderr, flush=True)
    return out


def main():
    pipeline_only = "--pipeline" in sys.argv
    decode = "synthetic"
    for a in sys.argv[1:]:
        if a.startswith("--decode="):
            decode = a.split("=", 1)[1]
    wait_for_tpu()
    import jax

    # persist compiled executables across runs (the fused pallas tower takes
    # minutes to compile cold; warm runs hit the cache)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    batch, n_seg = 8, 14
    params, infer, infer_raw = _build_model_and_infer(batch, n_seg)

    if pipeline_only:
        stats = measure_pipeline(params, infer_raw, batch, n_seg, decode=decode)
        print(json.dumps({
            "metric": "pipeline_clips_per_sec_per_chip",
            "value": round(stats["clips_per_sec"], 3),
            "unit": "clips/s",
            "vs_baseline": round(stats["clips_per_sec"] / CPU_BASELINE_CLIPS_PER_SEC, 2),
            "decode": decode,
            "host_wait_frac": round(stats["host_wait_frac"], 3),
            "h2d_frac": round(stats["h2d_frac"], 3),
            "h2d_mb_per_s": round(stats["h2d_mb_per_s"], 1),
        }))
        return

    clips_per_sec = measure_device_only(params, infer, batch, n_seg)
    record = {
        "metric": "sync_inference_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 3),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / CPU_BASELINE_CLIPS_PER_SEC, 2),
    }
    # sustained host->device pipeline (decode -> geometry/avstage -> staged
    # double-buffered H2D -> step, all overlapped) as extra keys; with real
    # cv2 decode in the loop when the reference's sample clips are present
    try:
        pipe_decode = decode
        if pipe_decode == "synthetic" and all(os.path.exists(p) for p in REAL_CLIPS):
            pipe_decode = "cv2"
        stats = measure_pipeline(params, infer_raw, batch, n_seg,
                                 decode=pipe_decode)
        record["pipeline_clips_per_sec"] = round(stats["clips_per_sec"], 3)
        record["pipeline_decode"] = pipe_decode
        # wall attribution (VERDICT r3 weak #2): host_wait = blocked on the
        # staged loader (decode + host geometry + any un-overlapped H2D);
        # h2d_frac = staging-thread busy fraction, OVERLAPPED with compute
        # since round 5 (StagedLoader double-buffering, VERDICT r4 task #3)
        record["pipeline_host_wait_frac"] = round(stats["host_wait_frac"], 3)
        record["pipeline_h2d_frac"] = round(stats["h2d_frac"], 3)
        record["pipeline_h2d_mb_per_s"] = round(stats["h2d_mb_per_s"], 1)
        if pipe_decode == "cv2":
            # decode-cache-steady synthetic variant for round-over-round
            # continuity (BENCH_r01..r04 measured this; the cv2 number above
            # includes real single-core decode, a different quantity)
            s2 = measure_pipeline(params, infer_raw, batch, n_seg,
                                  decode="synthetic")
            record["pipeline_synthetic_clips_per_sec"] = round(
                s2["clips_per_sec"], 3)
    except Exception as e:  # the headline metric must still print
        record["pipeline_error"] = str(e)[:200]
    # Stage-I/II train-step perf rides the same record (VERDICT r4 task #4)
    try:
        record.update(measure_train_steps())
    except Exception as e:
        record["train_error"] = str(e)[:200]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
