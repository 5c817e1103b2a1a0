#!/usr/bin/env python3
"""Full-scale multimodal measurement: real-codec encode/decode
throughput with VALUE-EXACT planted expectations, the measured scale
row for the multimodal family that every other operator family already
has in BASELINE_NOTES.

Three legs, each synthesized deterministically so the aggregate of the
decoded features has a closed form this script recomputes with numpy
and asserts exactly:

- PVM video (N_VID payloads, 4-8 frames of 12x12 RGB): in-plan
  printable-ASCII payload build, then ``extract_video_frames`` seeks to
  every 2nd frame and decodes only those rasters. Asserts the exact
  count of sampled frames and the exact sum of quantized frame means.
- PNG (N_PNG 24x24 RGB gradients): ``encode_png`` executor-side (all
  five spec filters cycling per row), parquet'd, then
  ``extract_png_features`` parses chunks, checks CRCs, inflates,
  reverses filters. Asserts the exact global pixel_sum.
- WAV (N_WAV PCM-16 mono clips, 2000 samples): ``encode_wav``
  executor-side, then ``extract_wav_features``. Asserts the exact
  global sample count and sum of per-clip integer sample sums.

Usage: python tools/fullscale_media.py [n_vid] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_VID = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
N_PNG = max(N_VID // 5, 1)
N_WAV = max(N_VID // 2, 1)
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_media"
VID_W = VID_H = 12
PNG_W = PNG_H = 24
WAV_SAMPLES = 2_000


def main() -> None:
    import numpy as np

    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import multimodal as M

    spark = get_spark("fullscale-media")

    # --- PVM video: in-plan payload build + sampled-frame decode ---------
    vid_path = os.path.join(WORKDIR, f"vid_{N_VID}.parquet")
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(vid_path, "_SUCCESS")):
        d = spark.range(N_VID).select(
            F.col("id").alias("media_id"),
            (4 + F.col("id") % 5).cast("int").alias("nf"),
        )
        d.select(
            "media_id",
            F.encode(
                F.concat(
                    F.lit("PV\n"),
                    F.col("nf").cast("string"),
                    F.lit(f" {VID_W} {VID_H}\n255\n"),
                    F.expr(
                        "aggregate(sequence(0, nf - 1), CAST('' AS STRING), "
                        "(acc, f) -> concat(acc, repeat(char("
                        f"32 + pmod(media_id * 3 + f * 7, 95)), "
                        f"{VID_W * VID_H * 3})))"
                    ),
                ),
                "UTF-8",
            ).alias("payload"),
        ).repartition(64).write.mode("overwrite").parquet(vid_path)
    vids = spark.read.parquet(vid_path)
    t_synth = time.monotonic() - t0

    t0 = time.monotonic()
    agg = (
        M.extract_video_frames(vids, every_n=2)
        .agg(
            F.count(F.lit(1)).alias("frames"),
            F.sum(F.col("mean_pixel").cast("long")).alias("mean_sum"),
        )
        .collect()[0]
    )
    t = time.monotonic() - t0
    ids = np.arange(N_VID, dtype=np.int64)
    nf = 4 + ids % 5
    exp_frames = int(((nf + 1) // 2).sum())
    exp_sum = 0
    for f in range(0, 8, 2):
        live = nf > f
        exp_sum += int((32 + (ids[live] * 3 + f * 7) % 95).sum())
    size = os.popen(f"du -sh {vid_path}").read().split()[0]
    print(
        f"pvm_video: {N_VID} videos ({size}, synth {t_synth:.1f}s) -> "
        f"{agg['frames']} sampled frames decoded in {t:.1f}s = "
        f"{agg['frames'] / t / 1e3:.0f}k frames/s, "
        f"{N_VID / t / 1e3:.0f}k videos/s; "
        f"frames {'MATCH' if agg['frames'] == exp_frames else 'MISMATCH'}, "
        f"mean-sum {'MATCH' if agg['mean_sum'] == exp_sum else 'MISMATCH'}",
        flush=True,
    )

    # --- PNG: executor-side encode, then full chunk/CRC/inflate decode ---
    png_path = os.path.join(WORKDIR, f"png_{N_PNG}.parquet")
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(png_path, "_SUCCESS")):
        d = spark.range(N_PNG).select(
            F.col("id").alias("media_id"),
            (F.col("id") % 95).cast("int").alias("c"),
        )

        def make_png(batches):
            import pandas as pd

            x = np.arange(PNG_W)
            y = np.arange(PNG_H)
            base = x[None, :] * 7 + y[:, None] * 13
            for pdf in batches:
                blobs = [
                    M.encode_png(
                        np.repeat(
                            ((32 + (base + int(c)) % 95).astype(np.uint8))[
                                :, :, None
                            ],
                            3,
                            axis=2,
                        ),
                        row_filter=lambda yy: yy % 5,
                    )
                    for c in pdf["c"]
                ]
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"], "payload": blobs}
                )

        d.repartition(64).mapInPandas(
            make_png, "media_id long, payload binary"
        ).write.mode("overwrite").parquet(png_path)
    t_enc = time.monotonic() - t0
    pngs = spark.read.parquet(png_path)

    t0 = time.monotonic()
    agg = (
        M.extract_png_features(pngs)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pixel_sum").alias("pixel_sum"),
        )
        .collect()[0]
    )
    t = time.monotonic() - t0
    x = np.arange(PNG_W)
    y = np.arange(PNG_H)
    base = x[None, :] * 7 + y[:, None] * 13
    cs = np.arange(N_PNG, dtype=np.int64) % 95
    per_c = np.array(
        [int((32 + (base + c) % 95).sum()) * 3 for c in range(95)],
        dtype=np.int64,
    )
    exp_pixel_sum = int(per_c[cs].sum())
    size = os.popen(f"du -sh {png_path}").read().split()[0]
    print(
        f"png: {N_PNG} images ({size}) encoded in {t_enc:.1f}s = "
        f"{N_PNG / max(t_enc, 1e-9) / 1e3:.0f}k img/s; decoded "
        f"(chunk parse + CRC + inflate + unfilter) in {t:.1f}s = "
        f"{agg['n'] / t / 1e3:.0f}k img/s; pixel-sum "
        f"{'MATCH' if agg['pixel_sum'] == exp_pixel_sum else 'MISMATCH'}",
        flush=True,
    )

    # --- WAV: executor-side PCM-16 encode, then decode -------------------
    wav_path = os.path.join(WORKDIR, f"wav_{N_WAV}.parquet")
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(wav_path, "_SUCCESS")):
        d = spark.range(N_WAV).select(
            F.col("id").alias("media_id"),
            (1 + F.col("id") % 7).cast("int").alias("k"),
        )

        def make_wav(batches):
            import pandas as pd

            i = np.arange(WAV_SAMPLES, dtype=np.int64)
            for pdf in batches:
                blobs = [
                    M.encode_wav(((i * int(k)) % 191 - 95).astype(np.int16))
                    for k in pdf["k"]
                ]
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"], "payload": blobs}
                )

        d.repartition(64).mapInPandas(
            make_wav, "media_id long, payload binary"
        ).write.mode("overwrite").parquet(wav_path)
    t_enc = time.monotonic() - t0
    wavs = spark.read.parquet(wav_path)

    t0 = time.monotonic()
    agg = (
        M.extract_wav_features(wavs)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_samples").alias("samples"),
            F.sum("sample_sum").alias("sample_sum"),
        )
        .collect()[0]
    )
    t = time.monotonic() - t0
    i = np.arange(WAV_SAMPLES, dtype=np.int64)
    per_k = np.array(
        [int(((i * k) % 191 - 95).sum()) for k in range(8)], dtype=np.int64
    )
    ks = 1 + np.arange(N_WAV, dtype=np.int64) % 7
    exp_sample_sum = int(per_k[ks].sum())
    size = os.popen(f"du -sh {wav_path}").read().split()[0]
    print(
        f"wav: {N_WAV} clips ({size}) encoded in {t_enc:.1f}s = "
        f"{N_WAV / max(t_enc, 1e-9) / 1e3:.0f}k clips/s; decoded in "
        f"{t:.1f}s = {agg['n'] / t / 1e3:.0f}k clips/s "
        f"({agg['samples'] / t / 1e6:.0f}M samples/s); sample-sum "
        f"{'MATCH' if agg['sample_sum'] == exp_sample_sum else 'MISMATCH'}",
        flush=True,
    )


if __name__ == "__main__":
    main()
