"""Multimodal-column plumbing (north-star surface).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partition sizing — is real and tested; the actual codec calls are
STUBBED (this container ships no image/audio libraries): ``decode_features``
computes deterministic fake features from the raw bytes, and
``decode_real`` raises NotImplementedError where PIL/ffmpeg would plug in.

At 100 TB: binary payloads dominate row size, so multimodal tables should be
written with small ``spark.sql.files.maxPartitionBytes`` relative to text
tables and processed with ``mapInPandas`` (streaming Arrow batches keep
executor memory bounded at batch-size × row-size).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("byte_entropy_bins", T.IntegerType()),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Deterministic fake media: payload = md5 digest bytes of the text,
    metadata struct alongside — the schema/layout a real ingest would use."""
    payload = F.unhex(F.md5(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.length(payload).cast("int").alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_features(df: DataFrame) -> DataFrame:
    """'Decode' + feature-extract over Arrow batches via mapInPandas.

    The fake decode derives features from raw bytes (mean, max, distinct
    byte-value count); a real implementation swaps the inner function for
    PIL/torchvision/ffmpeg calls — the batch plumbing is identical.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                raw = bytes(payload)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "format": meta["format"],
                        "n_bytes": len(raw),
                        "mean_byte": sum(raw) / len(raw) if raw else 0.0,
                        "max_byte": max(raw) if raw else 0,
                        "byte_entropy_bins": len(set(raw)),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def decode_real(df: DataFrame) -> DataFrame:
    """Real codec path — requires image/audio libraries not in this container."""
    raise NotImplementedError(
        "real media decoding needs PIL/ffmpeg; use decode_features for the "
        "deterministic stub pipeline"
    )
