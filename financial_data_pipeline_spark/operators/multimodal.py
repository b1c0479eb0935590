"""Multimodal column plumbing (beyond-reference scope).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, and implements decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages.

The decode kernels themselves are STUBS (this container ships no
image/audio codecs): ``decode_image`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder
(seeded by the payload hash) produces stable pseudo-features. The
Spark-side plumbing — schema, batch iteration, partition behavior —
is real and tested; swapping in PIL/ffmpeg later changes only the
inner function body.

Scale notes: binary payloads ride in parquet binary columns;
``mapInPandas`` streams Arrow batches so one task never materializes
its whole partition; per-batch decode keeps peak memory at
(batch_size × payload) regardless of partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("size_bytes", T.LongType(), False),
    ]
)


def attach_media_meta(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image"
) -> DataFrame:
    """Attach the typed metadata struct derived from the raw payload."""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(p).cast("long").alias("size_bytes"),
        ),
    )


def _fake_decode(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic fake decoder: features from the sha256 digest."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(n_features)]


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_features: int = 8,
    fake: bool = True,
    batch_limit: int = 256,
) -> DataFrame:
    """Decode payloads to fixed-width feature vectors via mapInPandas.

    ``fake=False`` is the real-decoder seam: raises NotImplementedError
    (no codecs in this container) — the batching/schema contract is
    identical either way.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
            T.StructField("decode_ok", T.BooleanType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # bound per-batch memory regardless of upstream batch size
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                if not fake:
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg; "
                        "run with fake=True in this environment"
                    )
                # NULL payload = failed decode (decode_ok False, no
                # features) — not a kernel crash: bytes(None) raised
                # out of the Python worker when the fuzzer planted
                # NULL-text docs upstream of the encode()
                feats, oks = [], []
                for p in chunk[payload_col]:
                    if p is None:
                        feats.append([])
                        oks.append(False)
                    else:
                        feats.append(_fake_decode(bytes(p), n_features))
                        oks.append(True)
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "features": feats,
                        "decode_ok": oks,
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame
    timestamp (decode stubbed — emits frame offsets only).

    The frame calendar is ``sequence()`` + ``explode`` — the same
    pattern as the resample bucket fill, fully JVM-side.
    """
    return df.select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col(duration_col).cast("long"),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ms"),
        F.length(payload_col).cast("long").alias("size_bytes"),
    )


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Image resize stage: binary in → binary out with updated
    dimension metadata, as an Arrow-batched ``mapInPandas`` kernel.

    The Spark-side plumbing (schema, batch shape, metadata rewrite) is
    real; the pixel resample itself is a DETERMINISTIC FAKE — the
    container ships no image codecs — that strided-samples the payload
    bytes to the target area so output size tracks target dimensions
    and is reproducible (`/root/reference` has no media path either;
    this is beyond-reference surface). Swapping ``_fake_resample`` for
    a PIL/cv2 call changes nothing about the plan: per-batch vectorized
    Python, no shuffle, binary columns never pass through the driver.
    """
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    target_len = max(1, target_w * target_h)

    def _fake_resample(payload: bytes) -> bytes:
        if not payload:
            return b""
        arr = np.frombuffer(bytes(payload), dtype=np.uint8)
        idx = np.linspace(0, len(arr) - 1, num=min(target_len, len(arr)))
        return arr[idx.astype(np.int64)].tobytes()

    def kernel(batches):
        for chunk in batches:
            if chunk.empty:
                continue
            yield pd.DataFrame(
                {
                    id_col: chunk[id_col].astype("int64"),
                    "payload": [_fake_resample(p) for p in chunk[payload_col]],
                    "width": target_w,
                    "height": target_h,
                }
            )

    cols = [id_col, payload_col]
    return df.select(*cols).mapInPandas(kernel, out_schema)
