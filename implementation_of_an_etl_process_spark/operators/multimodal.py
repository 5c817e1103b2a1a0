"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

Uncompressed raster images are decoded FOR REAL: ``decode_ppm`` parses
binary PPM (P6) with pure stdlib + numpy — header fields plus a
zero-copy uint8 view over the raster — no image library required, and
``extract_ppm_features`` runs it per Arrow batch under the driver gate
(``multimodal_ppm_decode``). Compressed codecs (JPEG/PNG/audio) DO
need an external library the container lacks, so that step stays
STUBBED (``decode_image`` raises NotImplementedError unless
``fake=True``); swapping the stub body for PIL/libsndfile calls is a
one-function change and every surrounding stage is exercised by the
real PPM path.

Design for 100 TB of media:
- payloads stay in executor-side Arrow batches end-to-end (mapInPandas);
  nothing is collected to the driver;
- metadata (dims, codec, duration) lives in plain columns so Catalyst
  can filter/prune WITHOUT touching payload bytes — a scan that filters
  on ``meta.width`` never deserializes the blob;
- per-batch memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low (e.g.
  64) for multi-MB payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),
                    T.StructField("codec", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)


def attach_media_meta(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Wrap raw binary into the engine's media schema: typed metadata in
    plain columns so downstream filters never touch payload bytes."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit("raw").alias("codec"),
            F.octet_length(payload_col).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int]:
    """STUB for COMPRESSED codecs: real deployments decode JPEG/PNG with
    PIL/turbojpeg here (uncompressed PPM decodes for real via
    ``decode_ppm`` below). ``fake=True`` derives deterministic
    dimensions from the payload bytes (so plumbing tests have stable
    expectations)."""
    if not fake:
        raise NotImplementedError(
            "compressed-image codecs are not available in this "
            "environment; use decode_ppm for P6 payloads or pass "
            "fake=True for the deterministic test decode"
        )
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "big")
    return (64 + h % 1024, 64 + (h >> 10) % 1024)


def decode_ppm(payload: bytes) -> tuple[int, int, float]:
    """REAL image decode, no codec library: binary PPM (P6, canonical
    ``P6\\n<w> <h>\\n<maxval>\\n<raster>`` layout) via stdlib header
    parsing and a zero-copy numpy uint8 view over the RGB raster.
    Returns (width, height, mean_pixel)."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    if len(parts) != 4:
        raise ValueError("truncated PPM header")
    dims = parts[1].split()
    if len(dims) != 2:
        raise ValueError("malformed PPM dimensions")
    w, h = int(dims[0]), int(dims[1])
    if int(parts[2]) != 255:
        raise ValueError("only maxval=255 PPM supported")
    n = w * h * 3
    raster = parts[3]
    if len(raster) < n:
        raise ValueError(f"raster holds {len(raster)} bytes, need {n}")
    arr = np.frombuffer(raster, dtype=np.uint8, count=n)
    return w, h, float(arr.mean())


PPM_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)


def extract_ppm_features(df: DataFrame) -> DataFrame:
    """media rows with P6 payloads -> (media_id, width, height,
    mean_pixel, n_bytes, checksum): the REAL-decode twin of
    ``extract_image_features`` — same mapInPandas batching, payloads
    never leave the executors, features-only output."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for batch in batches:
            decoded = [
                decode_ppm(p) if p is not None else (None, None, None)
                for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_pixel": [d[2] for d in decoded],
                    "n_bytes": [
                        len(p) if p is not None else None
                        for p in batch["payload"]
                    ],
                    "checksum": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in batch["payload"]
                    ],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        run, schema=PPM_FEATURES_SCHEMA
    )


def extract_image_features(df: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """media rows -> (media_id, width, height, n_bytes, checksum).

    mapInPandas: each Arrow batch is decoded vectorized-per-batch; the
    output drops the payload so downstream stages shuffle only features.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for batch in batches:
            dims = [
                decode_image(p, fake=fake_decode) if p is not None else (None, None)
                for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [
                        len(p) if p is not None else None for p in batch["payload"]
                    ],
                    "checksum": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in batch["payload"]
                    ],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, *, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit one row per
    sampled "frame" offset (deterministic stand-in for keyframe
    extraction). Row-explosion happens executor-side via mapInPandas,
    so a 1 GB video never materializes on the driver."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            ids, offsets = [], []
            for mid, p in zip(batch["media_id"], batch["payload"]):
                if p is None:
                    continue
                for off in range(0, len(p), every_n_bytes):
                    ids.append(mid)
                    offsets.append(off)
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_offset": pd.Series(offsets, dtype="int64")}
            )

    return df.select("media_id", "payload").mapInPandas(
        run, schema="media_id long, frame_offset long"
    )
