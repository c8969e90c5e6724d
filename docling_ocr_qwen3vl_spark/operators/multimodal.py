"""Multimodal columns: opaque binary blobs + typed metadata + decode stubs.

Design for 100 TB multimodal corpora: media lives as ``binary`` columns (or
object-store refs) beside typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so the
bytes cross into Python once per batch, never per row.

This container has no image/audio libraries, so the actual pixel/sample
decode is STUBBED: ``media_features`` computes real byte-level features
(length, digest, header bytes) plus a clearly-marked deterministic fake of
the decoded shape; ``decode_media`` raises NotImplementedError unless a
real backend (PIL/av) is importable.  The Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ("image", "audio", "video")

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha", StringType(), False),
        StructField("fake_width", IntegerType(), False),
        StructField("fake_height", IntegerType(), False),
    ]
)


def attach_media_blob(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque media column + typed metadata from a text corpus
    (sandbox stand-in for real bytes): blob = utf-8 bytes of the text,
    media_type cycles by doc_id."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, MEDIA_TYPES[0])
        .when(F.col("doc_id") % 3 == 1, MEDIA_TYPES[1])
        .otherwise(MEDIA_TYPES[2])
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("blob"),
    )


def _features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        rows = []
        for doc_id, media_type, blob in zip(
            batch["doc_id"], batch["media_type"], batch["blob"]
        ):
            data = bytes(blob) if blob is not None else b""
            # STUB decode: a real deployment replaces this branch with
            # PIL.Image.open / av.open inside the same batch loop; the fake
            # shape is a deterministic function of the header bytes so tests
            # and oracles can verify the plumbing end-to-end.
            fake_w = (data[0] + 1) if data else 0
            fake_h = (data[1] + 1) if len(data) > 1 else 0
            rows.append(
                (
                    doc_id,
                    media_type,
                    len(data),
                    hashlib.md5(data).hexdigest(),
                    fake_w,
                    fake_h,
                )
            )
        yield pd.DataFrame(rows, columns=FEATURES_SCHEMA.names)


def media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched byte-level feature extraction over the binary column."""
    return media.select("doc_id", "media_type", "blob").mapInPandas(
        _features_batches, FEATURES_SCHEMA
    )


def decode_media(media: DataFrame) -> DataFrame:  # pragma: no cover - gated
    """Real pixel/sample decode — requires PIL (images) / av (audio+video).

    Kept as the production slot: same mapInPandas shape as media_features,
    decoding into array columns.  Raises cleanly in this container.
    """
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Real media decode needs PIL/av, which this environment does not "
            "ship. The Spark plumbing (schema/partitioning/UDF batch shape) "
            "is exercised via media_features()."
        ) from exc
    raise NotImplementedError("wire PIL decode here on a real deployment")
