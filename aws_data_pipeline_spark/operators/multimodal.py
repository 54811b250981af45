"""Multimodal-column plumbing (north-star surface).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partition sizing — is real and tested; the actual codec calls are
STUBBED (this container ships no image/audio libraries): ``decode_features``
computes deterministic fake features from the raw bytes, and ``decode_real``
probes for Pillow at import — it decodes for real when PIL is installed and
raises NotImplementedError here.

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

from aws_data_pipeline_spark.operators import widen_narrow_input

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
            if len(pdf) == 0:
                # pd.DataFrame([]) has NO columns — Arrow re-serialization
                # against the declared schema would fail on the empty batch
                continue
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                if payload is None:
                    # a NULL payload (nullable per MEDIA_SCHEMA) must not
                    # TypeError the whole Arrow batch — skip the object,
                    # keep the other 10k rows (the module's stated policy)
                    continue
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

    return widen_narrow_input(df).mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(df: DataFrame, width: int = 4, height: int = 2) -> DataFrame:
    """'Resize' stub over Arrow batches: nearest-neighbor byte resampling of
    the payload to width*height bytes (a real implementation swaps the inner
    loop for PIL ``Image.resize``; schema, batch shape, and output layout are
    exactly what the real op uses). Deterministic — tested for idempotence.
    """
    import pandas as pd

    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue  # column-less empty frame breaks Arrow re-serialization
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # NULL payload: skip the object, not the batch
                raw = bytes(payload)
                if raw:
                    resized = bytes(
                        raw[(i * len(raw)) // n_out] for i in range(n_out)
                    )
                else:
                    resized = b"\x00" * n_out
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload": resized,
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(rows)

    return widen_narrow_input(df).mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_bytes: int = 4, every_nth: int = 2
) -> DataFrame:
    """Frame-sampling stub: treat the payload as a 'video' of fixed-size
    frames and emit every ``every_nth`` frame as its own row (1 row in ->
    many rows out, the fan-out shape real ffmpeg sampling has; mapInPandas
    handles asymmetric batch cardinality natively)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # NULL payload: skip the object, not the batch
                raw = bytes(payload)
                n_frames = len(raw) // frame_bytes
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return widen_narrow_input(df).mapInPandas(run, schema=FRAMES_SCHEMA)


# import-probed at module load: decode_real lights up automatically in an
# environment that ships Pillow, with no code change
# (re-probed r8 through r13 (latest 2026-08-16, r13 round start):
# `pip install Pillow` still resolves no distribution from this sandbox
# ("from versions: none") and PIL is not importable afterwards — the
# stub below remains the honest path)
try:
    from PIL import Image as _PIL_IMAGE
except ImportError:  # container has no image libraries — honest stub below
    _PIL_IMAGE = None

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
    ]
)


def decode_real(df: DataFrame) -> DataFrame:
    """Real image decode over Arrow batches (PIL), same mapInPandas plumbing
    as ``decode_features``. Available iff Pillow importable at module load;
    otherwise raises — the deterministic stub pipeline (`decode_features`)
    is the tested path in codec-less environments. Payloads that fail to
    decode yield null dimensions rather than poisoning the batch (at scale
    a corrupt object must not kill a 10k-row Arrow batch)."""
    if _PIL_IMAGE is None:
        raise NotImplementedError(
            "real media decoding needs PIL/ffmpeg; use decode_features for "
            "the deterministic stub pipeline"
        )
    import io

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue  # column-less empty frame breaks Arrow re-serialization
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    img = _PIL_IMAGE.open(io.BytesIO(bytes(payload)))
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "format": img.format,
                            "width": img.width,
                            "height": img.height,
                            "mode": img.mode,
                        }
                    )
                except Exception:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "format": None,
                            "width": None,
                            "height": None,
                            "mode": None,
                        }
                    )
            yield pd.DataFrame(rows)

    return widen_narrow_input(df).mapInPandas(run, schema=DECODED_SCHEMA)
