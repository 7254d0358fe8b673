"""Time / profile the flagship paths on the real TPU chip.

Consolidates the round-2 measurement recipe (previously ad-hoc /tmp scripts;
profile recipe documented in CLAUDE.md):

    python scripts/profile_tpu.py e2e              # inference throughput
    python scripts/profile_tpu.py e2e --profile    # + device-op breakdown
    python scripts/profile_tpu.py stage1           # Stage-I train step, B=2
    python scripts/profile_tpu.py stage2           # Stage-II train step, B=16

Notes for this machine (axon tunnel): `block_until_ready` does not wait —
every sync below goes through `np.asarray` of a scalar; the persistent
compile cache at /tmp/jax_cache makes warm starts fast (cold pallas tower
compiles take minutes).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def _fake_params(model, *example_args):
    """Constant-filled params with the real shapes/dtypes (init traced through
    the towers costs minutes over the remote-compile tunnel)."""
    tree = jax.eval_shape(lambda k: model.init(k, *example_args),
                          jax.random.PRNGKey(0))
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), tree)


def _sync(x) -> float:
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def build_e2e(batch: int):
    from synchformer_tpu.models.presets import build_synchformer
    from synchformer_tpu.ops.mel import log_mel_spectrogram

    from synchformer_tpu.ops.video import fold_video_normalize

    n_seg = 14
    model = build_synchformer(n_segments=n_seg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    # production eval path (same as bench.py): patch-major uint8 video
    # (dense patch embed), the video normalization affine constant-folded
    # into the patch-embed weights
    from synchformer_tpu.data.avstage import patchify_u8

    vis = jnp.asarray(patchify_u8(rng.integers(
        0, 256, (batch, n_seg, 16, 224, 224, 3), dtype=np.uint8)))
    pcm = jnp.asarray((rng.standard_normal(
        (batch, n_seg, 10240)) * 0.1).astype(np.float32))
    params = _fake_params(model, jnp.zeros((batch, n_seg, 16, 224, 224, 3)),
                          jnp.zeros((batch, n_seg, 66, 128)))
    params = fold_video_normalize(params)

    @jax.jit
    def infer(params, vis, pcm):
        mel = log_mel_spectrogram(pcm)
        aud = jnp.swapaxes(mel, -1, -2).astype(jnp.bfloat16)
        _, logits = model.apply(params, vis, aud)
        return jax.nn.softmax(logits.astype(jnp.float32), -1)

    def run():
        return infer(params, vis, pcm)

    return run, ("clips/s", batch)


def build_stage1(batch: int):
    from synchformer_tpu.models.presets import build_avclip
    from synchformer_tpu.train.state import SyncTrainState, make_optimizer
    from synchformer_tpu.train.step import make_avclip_train_step

    S = 14
    model = build_avclip(n_segments_train=S, dtype=jnp.bfloat16, remat=True)
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.standard_normal(
        (batch, S, 16, 224, 224, 3)).astype(np.float32)).astype(jnp.bfloat16)
    aud = jnp.asarray(rng.standard_normal(
        (batch, S, 66, 128)).astype(np.float32)).astype(jnp.bfloat16)
    params = _fake_params(model, vis, aud)["params"]
    tx = make_optimizer("adamw", lr=1e-4, max_clip_norm=1.0)
    state = SyncTrainState.create(params, tx,
                                  trainable_keys=tuple(params.keys()))
    step = make_avclip_train_step(model)
    batch_d = dict(vis=vis, aud=aud)
    key = jax.random.PRNGKey(1)
    holder = {"state": state}

    def run():
        holder["state"], m = step(holder["state"], batch_d, key)
        return m["loss"]

    return run, ("samples/s", batch)


def build_stage2(batch: int):
    from synchformer_tpu.models.presets import build_synchformer
    from synchformer_tpu.train.state import SyncTrainState, make_optimizer
    from synchformer_tpu.train.step import make_sync_train_step

    S = 14
    model = build_synchformer(n_segments=S, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.standard_normal(
        (batch, S, 16, 224, 224, 3)).astype(np.float32)).astype(jnp.bfloat16)
    aud = jnp.asarray(rng.standard_normal(
        (batch, S, 66, 128)).astype(np.float32)).astype(jnp.bfloat16)
    targets = jnp.asarray(rng.integers(0, 21, batch), dtype=jnp.int32)
    params = _fake_params(model, vis, aud)["params"]
    tx = make_optimizer("adamw", lr=1e-4, max_clip_norm=1.0)
    state = SyncTrainState.create(params, tx)  # default: frozen towers
    step = make_sync_train_step(model, donate=False)
    batch_d = dict(vis=vis, aud=aud, targets=targets)
    key = jax.random.PRNGKey(1)
    holder = {"state": state}

    def run():
        holder["state"], m = step(holder["state"], batch_d, key)
        return m["loss"]

    return run, ("samples/s", batch)


def build_attn(batch: int):
    """Standalone pallas divided-attention microbench at production dims
    (B*S=112, f=8, n=196, D=768 packed [q|k|v]) — the kernel-iteration loop
    for the VPU/MXU-overlap work. Reports ms per (space, time) layer-call."""
    from synchformer_tpu.ops.pallas.divided_attention import (
        divided_attention_pallas_4d,
    )

    bsz = batch  # B*S
    f, n, d = 8, 196, 768
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((bsz, f, n, 3 * d))
                     .astype(np.float32)).astype(jnp.bfloat16)
    xc = jnp.asarray(rng.standard_normal((bsz, 1, 3 * d))
                     .astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run_pair(xp, xc):
        sp, sc = divided_attention_pallas_4d(xp, xc, 12, "space")
        tp, tc = divided_attention_pallas_4d(xp, xc, 12, "time")
        return (jnp.sum(sp.astype(jnp.float32)) + jnp.sum(sc.astype(jnp.float32))
                + jnp.sum(tp.astype(jnp.float32)) + jnp.sum(tc.astype(jnp.float32)))

    def run():
        return run_pair(xp, xc)

    return run, ("layer-pair/s", 1)


def parse_trace(outdir: str, n_iter: int, top: int = 30) -> None:
    """Group device events (pid 3) by XLA op long_name; ms per iteration."""
    tr = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tr) as f:
        data = json.load(f)
    ev = [e for e in data["traceEvents"]
          if e.get("ph") == "X" and e.get("pid") == 3]
    agg, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        name = e.get("args", {}).get("long_name", e.get("name", "?"))
        if name.startswith("jit_"):  # whole-program envelope event
            continue
        key = name.split("(")[0][:120]
        agg[key] += e["dur"]
        cnt[key] += 1
    total = sum(agg.values())
    print(f"device total: {total / n_iter / 1000:.1f} ms/iter "
          f"({len(ev) // n_iter} events)")
    for k, v in agg.most_common(top):
        print(f"{v / n_iter / 1000:8.2f} ms x{cnt[k] // n_iter:<4} "
              f"{100 * v / total:5.1f}%  {k}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["e2e", "stage1", "stage2", "attn"])
    ap.add_argument("--batch", type=int, default=None,
                    help="default: e2e 8 / stage1 2 / stage2 16 / attn 112")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--profile", action="store_true",
                    help="capture a 3-iter device trace and print the op "
                         "breakdown instead of best-of-3 timing")
    args = ap.parse_args()

    batch = args.batch or {"e2e": 8, "stage1": 2, "stage2": 16,
                           "attn": 112}[args.mode]
    run, (unit, b) = {"e2e": build_e2e, "stage1": build_stage1,
                      "stage2": build_stage2, "attn": build_attn}[args.mode](batch)

    _sync(run())  # compile + warm
    print("compiled/warm", flush=True)

    if args.profile:
        outdir = f"/tmp/prof_{args.mode}"
        os.system(f"rm -rf {outdir}")
        jax.profiler.start_trace(outdir)
        for _ in range(3):
            out = run()
        _sync(out)
        jax.profiler.stop_trace()
        parse_trace(outdir, n_iter=3)
        return

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    per_iter = best / args.iters
    print(f"{args.mode}: {per_iter * 1000:.1f} ms/iter  "
          f"({b / per_iter:.2f} {unit}/chip, B={b}, best of 3x{args.iters})")


if __name__ == "__main__":
    main()
