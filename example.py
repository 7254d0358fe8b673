"""Single-clip offset prediction CLI (parity with ref: example.py).

Usage:
  python example.py exp_name=24-01-04T16-39-21 vid_path=data/clip.mp4 \
      offset_sec=1.6 [v_start_i_sec=0.0] [ckpt_dir=./checkpoints]

Loads a published reference checkpoint (PyTorch .pt, converted on the fly to
flax params), decodes + re-encodes the clip to 25 fps / 16 kHz / 256-side if
needed, applies the deterministic test transform with the requested fixed
offset, runs the jitted TPU forward (device-side mel front-end included) and
prints the top-5 offset probabilities on the 21-class grid.

Expected outputs on the reference assets (ref: README.md:73-97):
  +1.6 s on 3qesirWAGt4_20000_30000.mp4 -> p=0.8076 @ class 18 ("1.60")
  -2.0 s (v_start 4.0) on ZYc410CE4Rg_0_10000.mp4 -> p=0.8291 @ class 0
"""
from __future__ import annotations

import logging
import sys
from pathlib import Path

import numpy as np

# checkpoint-id -> download URL (a3s.fi object store), kept for capability
# parity with ref: utils/utils.py:13-66 (this environment has no egress; the
# files must already exist under ckpt_dir)
FNAME2LINK = {
    f"{exp}.pt": f"https://a3s.fi/swift/v1/AUTH_a235c0f452d648828f745589cde1219a/sync/sync_models/{exp}/{exp}.pt"
    for exp in ("24-01-04T16-39-21", "24-01-02T10-00-53", "23-12-23T18-33-57",
                "24-01-22T20-34-52")
}


def check_if_file_exists_else_download(path: str):
    path = Path(path)
    if path.exists():
        return str(path)
    url = FNAME2LINK.get(path.name)
    if url is None:
        raise FileNotFoundError(path)
    logging.info(f"downloading {url} -> {path}")
    import urllib.request

    path.parent.mkdir(parents=True, exist_ok=True)
    urllib.request.urlretrieve(url, str(path))
    return str(path)


def decode_single_video_prediction(logits: np.ndarray, grid: np.ndarray, k: int = 5):
    probs = np.exp(logits - logits.max()) / np.exp(logits - logits.max()).sum()
    order = np.argsort(-probs)[:k]
    print("Prediction Result:")
    for cls in order:
        print(f"p={probs[cls]:.4f} ({logits[cls]:.4f}), "
              f"label={cls} ({grid[cls]:.2f} sec)")
    return order[0]


def main():
    logging.basicConfig(level=logging.INFO)
    kv = dict(item.split("=", 1) for item in sys.argv[1:] if "=" in item)
    exp_name = kv.get("exp_name", "24-01-04T16-39-21")
    vid_path = kv["vid_path"]
    offset_sec = float(kv.get("offset_sec", 0.0))
    v_start_i_sec = float(kv.get("v_start_i_sec", 0.0))
    ckpt_dir = kv.get("ckpt_dir", "./checkpoints")
    fp32 = kv.get("fp32", "false").lower() == "true"

    import jax
    import jax.numpy as jnp

    from synchformer_tpu.data.media import available_backends, get_video_and_audio, reencode_video
    from synchformer_tpu.data.transforms import SyncPipelineConfig, make_class_grid, prepare_item
    from synchformer_tpu.models.presets import (
        build_synchformer,
        build_synchformer_from_ckpt_args,
    )
    from synchformer_tpu.ops.mel import MelSpectrogramConfig, log_mel_spectrogram
    from synchformer_tpu.ops.video import prepare_video_batch
    from synchformer_tpu.utils.checkpoint import (
        convert_sync_checkpoint,
        load_torch_checkpoint,
        plain_from_ckpt_args,
    )

    ckpt_path = check_if_file_exists_else_download(f"{ckpt_dir}/{exp_name}.pt")
    ckpt = load_torch_checkpoint(ckpt_path)

    dtype = jnp.float32 if fp32 else jnp.bfloat16
    # reconstruct the exact trained architecture from the cfg embedded in the
    # checkpoint (ref: example.py:104-115 + patch_config); ckpts without args
    # fall back to the full-size S=14 preset
    args = plain_from_ckpt_args(ckpt.get("args")) if isinstance(ckpt, dict) else None
    if isinstance(args, dict) and "model" in args:
        model, info = build_synchformer_from_ckpt_args(args, dtype=dtype)
        logging.info("model reconstructed from ckpt args "
                     f"({args['model']['target']}, seq_len={info['target_seq_len']})")
    else:
        logging.info("no cfg embedded in ckpt; using the full-size S=14 preset")
        model = build_synchformer(n_segments=14, dtype=dtype)
        info = dict(target_seq_len=198, num_cls=21, max_off_sec=2.0,
                    max_spec_t=66, num_mel_bins=128, data={})
    params = convert_sync_checkpoint(ckpt, target_seq_len=info["target_seq_len"])

    video, audio, meta = get_video_and_audio(vid_path)
    v_fps = meta["video"]["fps"][0]
    a_rate = meta["audio"]["framerate"][0]
    h, w = video.shape[1:3]
    if v_fps != 25 or a_rate != 16_000 or min(h, w) != 256:
        if "ffmpeg" in available_backends():
            logging.info("re-encoding to 25 fps / 16 kHz / 256 side")
            vid_path = reencode_video(vid_path)
            video, audio, meta = get_video_and_audio(vid_path)
        else:
            # in-framework fallback: frame-index resample + letterbox +
            # device sinc resample (ResampleResizeLetterboxPad equivalent)
            from synchformer_tpu.data.transforms import ingest_noncanonical

            logging.info("no ffmpeg; using in-framework resample/letterbox")
            video, audio = ingest_noncanonical(video, audio, v_fps, a_rate)

    # pipeline knobs follow the checkpoint's data section (ref: example.py
    # builds transforms from cfg.data); absent keys keep the S=14 defaults
    data = info["data"]
    pipe_kwargs = {k: data[k] for k in
                   ("crop_len_sec", "max_off_sec", "step_size_seg",
                    "segment_size_vframes", "n_segments", "input_size",
                    "size_before_crop", "vfps", "afps")
                   if data.get(k) is not None}
    pipe_kwargs["num_off_cls"] = info["num_cls"]
    cfg = SyncPipelineConfig(**pipe_kwargs)
    item = prepare_item(video, audio, cfg, np.random.default_rng(0), split="test",
                        fixed_offset_sec=offset_sec,
                        fixed_v_start_sec=v_start_i_sec)

    @jax.jit
    def infer(params, video_u8, pcm):
        vis = prepare_video_batch(video_u8[None], train=False, dtype=dtype)
        mel = log_mel_spectrogram(
            pcm[None], MelSpectrogramConfig(max_spec_t=info["max_spec_t"],
                                            n_mels=info["num_mel_bins"]))
        aud = jnp.swapaxes(mel, -1, -2).astype(dtype)
        _, logits = model.apply({"params": params}, vis, aud)
        return logits[0].astype(jnp.float32)

    logits = np.asarray(infer(params, jnp.asarray(item["video"]),
                              jnp.asarray(item["audio"])))
    grid = make_class_grid(-info["max_off_sec"], info["max_off_sec"],
                           info["num_cls"])
    print(f"using offset={offset_sec} v_start={v_start_i_sec} "
          f"(target class {int(item['offset_target'])})")
    decode_single_video_prediction(logits, grid)


if __name__ == "__main__":
    main()
