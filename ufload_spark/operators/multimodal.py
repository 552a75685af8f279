"""Multimodal column plumbing (extension surface).

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata; decode/feature-extract runs as Arrow-batched pandas over
``mapInPandas``. The decode itself is STUBBED (no image/audio libraries in
this environment): :func:`decode_image` raises ``NotImplementedError``, and
the pipeline uses a deterministic fake extractor so the Spark-side plumbing —
schema, batch shape, Arrow binary transfer, partitioning — is real and
testable end-to-end.

The fixture has no binary table, so the binary column is derived from
``documents.text`` (UTF-8 encode) — which also gives the fake extractor an
exact DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table

META_SCHEMA = "doc_id long, n_bytes long, fake_width int, fake_height int"


def decode_image(content: bytes) -> "object":
    """Real decode hook — requires an image library not present here.

    STUB: a production build plugs Pillow/libvips in; the surrounding
    dataflow (binary column → mapInPandas → typed metadata) is unchanged.
    """
    raise NotImplementedError("image decoding requires an image library (stubbed)")


def _fake_extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake 'decode': byte length → pretend dimensions.

    Arrow hands us column batches; we never materialize more than one batch,
    so memory stays bounded per task regardless of table size.
    """
    for pdf in batches:
        n = pdf["content"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n.astype("int64"),
                "fake_width": (n % 640).astype("int32"),
                "fake_height": (n % 480).astype("int32"),
            }
        )


def with_binary_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with an opaque binary payload column (UTF-8 bytes of text,
    standing in for image bytes)."""
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.encode("text", "UTF-8").alias("content"))


@register(
    "multimodal_decode_meta",
    """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
       CAST(octet_length(encode(text)) % 480 AS INT) AS fake_height
FROM documents
""",
    doc="binary-column decode/feature-extract via Arrow mapInPandas (stubbed decode)",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal pipeline shape: binary column in, typed metadata out,
    via ``mapInPandas`` (Arrow batches, ~10-100× faster than row-at-a-time
    Python). Narrow map — scales linearly, no shuffle."""
    return with_binary_content(spark, sf_dir).mapInPandas(
        _fake_extract_batches, schema=META_SCHEMA
    )
