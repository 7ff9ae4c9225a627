"""Codec decode-bandwidth micro-bench (r10 punch #1): measures the
pure-Python/numpy codec family's single-core decode throughput over
REALISTIC-SIZED payloads (photo-like 256x256 images, multi-second
audio) — not the tiny per-doc fixtures the correctness queries use —
so SCALE.md can state a measured MB/s-per-core number and the
crossover where the documented native plug point
(``operators/multimodal.py`` module docstring) becomes mandatory.

Usage:  python tools/codec_bench.py [--size 256] [--reps 3]
Prints one JSON line:
  {"format": {"payload_mb": .., "mb_per_s": .., "mpx_per_s": ..,
              "ms_per_item": ..}, ...}

Methodology: each format decodes ONE deterministic payload ``reps``
times on one core; throughput = payload bytes / median wall time.
Content is photo-like (smooth gradients + structured pattern +
deterministic noise), so JPEG streams carry real AC energy, PNG
filters see non-trivial rows, and GIF LZW sees mixed runs — the
worst realistic case for the interpreted inner loops, not the
best-case constant blocks.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_solution_spark.operators.multimodal import (  # noqa: E402
    decode_gif,
    decode_image,
    decode_jpeg,
    decode_tiff,
    decode_wav,
    encode_gif,
    encode_jpeg,
    encode_jpeg_progressive,
    encode_png,
    encode_tiff,
    encode_wav,
)


def photo_like(h: int, w: int, seed: int = 7) -> np.ndarray:
    """Deterministic photo-ish RGB: smooth gradients + sinusoidal
    texture + quantized noise (real AC energy, compressible but not
    degenerate)."""
    rng = np.random.default_rng(seed)
    y = np.linspace(0, 1, h).reshape(-1, 1)
    x = np.linspace(0, 1, w).reshape(1, -1)
    base = 128 + 90 * np.sin(6.28 * (x * 2 + y)) * np.cos(6.28 * y * 3)
    noise = rng.normal(0, 12, size=(h, w))
    px = np.stack(
        [
            base + noise,
            base * 0.8 + 30 + noise,
            255 - base * 0.6 + noise,
        ],
        axis=-1,
    )
    return np.clip(px, 0, 255).astype(np.uint8)


def bench_one(payload: bytes, decode, reps: int, n_px: int) -> dict:
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        decode(payload)
        times.append(time.perf_counter() - t0)
    t = statistics.median(times)
    return {
        "payload_mb": round(len(payload) / 1e6, 3),
        "mb_per_s": round(len(payload) / 1e6 / t, 3),
        "mpx_per_s": round(n_px / 1e6 / t, 3),
        "ms_per_item": round(t * 1e3, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    s = args.size
    px = photo_like(s, s)
    gray = px[:, :, 0]
    n_px = s * s
    out: dict[str, dict] = {}

    out["jpeg_baseline_gray"] = bench_one(
        encode_jpeg(gray), decode_jpeg, args.reps, n_px
    )
    out["jpeg_baseline_420"] = bench_one(
        encode_jpeg(px, subsampling="420"), decode_jpeg, args.reps, n_px
    )
    out["jpeg_progressive_420"] = bench_one(
        encode_jpeg_progressive(px, subsampling="420"),
        decode_jpeg,
        args.reps,
        n_px,
    )
    out["png_truecolor"] = bench_one(
        encode_png(px), decode_image, args.reps, n_px
    )
    out["png_adam7"] = bench_one(
        encode_png(px, interlace=True), decode_image, args.reps, n_px
    )
    # GIF: fixed 4x4x4 RGB-cube palette (64 entries, never overflows)
    idx = (
        (px[:, :, 0].astype(np.int32) >> 6) << 4
        | (px[:, :, 1].astype(np.int32) >> 6) << 2
        | (px[:, :, 2].astype(np.int32) >> 6)
    )
    lv = np.arange(64, dtype=np.int32)
    pal = np.stack(
        [(lv >> 4 & 3) * 85, (lv >> 2 & 3) * 85, (lv & 3) * 85], axis=-1
    ).astype(np.uint8)
    out["gif_single_frame"] = bench_one(
        encode_gif(idx.reshape(1, s, s).astype(np.uint8), pal),
        decode_gif,
        args.reps,
        n_px,
    )
    out["tiff_lzw_predictor"] = bench_one(
        encode_tiff(px, compression="lzw", predictor=True, rows_per_strip=64),
        decode_tiff,
        args.reps,
        n_px,
    )
    out["tiff_packbits"] = bench_one(
        encode_tiff(px, compression="packbits", rows_per_strip=64),
        decode_tiff,
        args.reps,
        n_px,
    )
    # r11 TIFF shapes: tiled reassembly and 16-bit samples share the
    # LZW core, so the numbers quantify the layout overhead alone
    out["tiff_tiled_lzw"] = bench_one(
        encode_tiff(px, compression="lzw", predictor=True, tile=(64, 64)),
        decode_tiff,
        args.reps,
        n_px,
    )
    out["tiff_16bit_lzw"] = bench_one(
        encode_tiff(px, compression="lzw", predictor=True, bits=16,
                    rows_per_strip=64),
        decode_tiff,
        args.reps,
        n_px,
    )
    # WAV: 10 s stereo 44.1 kHz PCM16 (sine + noise)
    t = np.arange(441000) / 44100.0
    rng = np.random.default_rng(11)
    wave = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=t.size)
    pcm = np.stack([wave, wave * 0.7], axis=-1)
    pcm16 = np.clip(pcm * 32767, -32768, 32767).astype(np.int16)
    out["wav_pcm16_stereo"] = bench_one(
        encode_wav(pcm16, 44100),
        decode_wav,
        args.reps,
        pcm16.size,  # "pixels" = samples
    )
    # r11: IMA ADPCM — the per-sample recursion is vectorized across
    # blocks, so throughput is set by samples-per-block python steps
    out["wav_ima_adpcm_stereo"] = bench_one(
        encode_wav(pcm16, 44100, fmt="adpcm"),
        decode_wav,
        args.reps,
        pcm16.size,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
