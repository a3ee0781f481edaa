"""Multimodal column handling (training-data-pipeline extra).

Images/audio/video are opaque `binary` columns with typed metadata.  The
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partition-size hygiene for large blobs — is real and tested; the actual
codec work is STUBBED (this container has no image/audio libraries): when
Pillow (or an equivalent) is importable it is used, otherwise a clearly
deterministic fake derived from the byte content is returned so pipelines
remain testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), False),
    ]
)

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _decode_one(blob: bytes | None) -> tuple[int | None, int | None, str | None, bool]:
    if blob is None:
        return None, None, None, False
    if _HAVE_PIL:  # pragma: no cover
        import io

        try:
            with Image.open(io.BytesIO(blob)) as im:
                return im.width, im.height, (im.format or "unknown"), True
        except Exception:  # noqa: BLE001
            return None, None, "undecodable", False
    # Deterministic fake: dimensions derived from the content hash so tests
    # have stable expectations; decoded=False marks it as a stub result.
    h = hashlib.sha256(blob).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, "stub", False


def image_metadata(df: DataFrame, blob_col: str = "html",
                   url_col: str = "url") -> DataFrame:
    """Batch decode/inspect binary blobs via mapInPandas (one Arrow batch at
    a time — blobs never materialize as a Python list of rows)."""
    cols = df.select(F.col(url_col).alias("url"), F.col(blob_col).alias("blob"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            meta = [_decode_one(b) for b in blobs]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "n_bytes": [len(b) if b is not None else None for b in blobs],
                    "sha256": [
                        hashlib.sha256(b).hexdigest() if b is not None else None
                        for b in blobs
                    ],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "format": [m[2] for m in meta],
                    "decoded": [m[3] for m in meta],
                }
            )

    return cols.mapInPandas(decode, IMAGE_META_SCHEMA)


def binary_exact_dups(df: DataFrame, blob_col: str = "html") -> DataFrame:
    """Exact duplicate detection on binary payloads: sha2 groupBy — the A1
    operator applied to the multimodal column (JVM-side hash, no UDF)."""
    return (
        df.filter(F.col(blob_col).isNotNull())
        .groupBy(F.sha2(F.col(blob_col), 256).alias("sha256"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("url").alias("keep_url"))
    )
