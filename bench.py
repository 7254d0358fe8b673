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
import subprocess
import sys
import time

import numpy as np

# identical pipeline, JAX on host CPU, fp32, B=1 (measured on this machine:
# 81.2 s/clip -> 0.0123 clips/s)
CPU_BASELINE_CLIPS_PER_SEC = 0.0123

_PROBE = ("import jax, jax.numpy as jnp, numpy as np; "
          "print(float(np.asarray(jnp.sum(jnp.ones((8, 8))))))")


def wait_for_tpu(attempts: int = 10, probe_timeout: int = 120,
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


def main():
    wait_for_tpu()
    import jax
    import jax.numpy as jnp

    # persist compiled executables across runs (the fused pallas tower takes
    # minutes to compile cold; warm runs hit the cache)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from synchformer_tpu.models.presets import build_synchformer
    from synchformer_tpu.ops.mel import log_mel_spectrogram

    batch, n_seg = 8, 14
    model = build_synchformer(n_segments=n_seg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.standard_normal((batch, n_seg, 16, 224, 224, 3)).astype(np.float32))
    pcm = jnp.asarray((rng.standard_normal((batch, n_seg, 10240)) * 0.1).astype(np.float32))

    shapes = jax.eval_shape(
        lambda k: model.init(k, vis, jnp.zeros((batch, n_seg, 66, 128))),
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes)

    @jax.jit
    def infer(params, vis, pcm):
        mel = log_mel_spectrogram(pcm)           # (B, S, 128, 66)
        aud = jnp.swapaxes(mel, -1, -2)          # (B, S, 66, 128)
        _, logits = model.apply(params, vis, aud)
        return jax.nn.softmax(logits.astype(jnp.float32), -1)

    # compile + warmup (force sync via host transfer: the axon platform's
    # block_until_ready does not wait for remote completion)
    np.asarray(infer(params, vis, pcm))

    n_iter = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = infer(params, vis, pcm)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)

    clips_per_sec = batch * n_iter / best
    print(json.dumps({
        "metric": "sync_inference_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 3),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / CPU_BASELINE_CLIPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
