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


TARGET_EDGE = 128  # resize target: longest edge in px

RESIZE_SCHEMA = (
    "doc_id long, fake_width int, fake_height int, out_width int, out_height int"
)


def resize_image(content: bytes, edge: int) -> bytes:
    """Real resize hook — requires an image library not present here.

    STUB: production plugs Pillow/libvips in; the dataflow (binary in,
    binary + new dims out via mapInPandas) is unchanged.
    """
    raise NotImplementedError("image resizing requires an image library (stubbed)")


def _fake_resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake resize: scale fake dims so the longest edge is
    TARGET_EDGE (no upscaling), floor-rounded — the arithmetic a real
    thumbnailer does, minus the pixels."""
    for pdf in batches:
        n = pdf["content"].map(len)
        w = (n % 640 + 1).astype("int64")
        h = (n % 480 + 1).astype("int64")
        longest = w.where(w >= h, h)
        # integer math only, so the DuckDB oracle is bit-identical
        ow = w.where(longest <= TARGET_EDGE, w * TARGET_EDGE // longest)
        oh = h.where(longest <= TARGET_EDGE, h * TARGET_EDGE // longest)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fake_width": w.astype("int32"),
                "fake_height": h.astype("int32"),
                "out_width": ow.astype("int32"),
                "out_height": oh.astype("int32"),
            }
        )


@register(
    "multimodal_resize_meta",
    f"""
WITH dims AS (
  SELECT doc_id,
         octet_length(encode(text)) % 640 + 1 AS w,
         octet_length(encode(text)) % 480 + 1 AS h
  FROM documents
)
SELECT doc_id, CAST(w AS INT) AS fake_width, CAST(h AS INT) AS fake_height,
       CAST(CASE WHEN greatest(w, h) <= {TARGET_EDGE} THEN w
                 ELSE w * {TARGET_EDGE} // greatest(w, h) END AS INT) AS out_width,
       CAST(CASE WHEN greatest(w, h) <= {TARGET_EDGE} THEN h
                 ELSE h * {TARGET_EDGE} // greatest(w, h) END AS INT) AS out_height
FROM dims
""",
    doc="image resize plumbing (stubbed decode): aspect-preserving thumbnail dims",
)
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-stage shape: binary in → mapInPandas → per-image output
    geometry. A real deployment replaces the fake with
    :func:`resize_image` and adds the thumbnail bytes to the output schema —
    the plan (narrow Arrow-batched map, no shuffle) is identical."""
    return with_binary_content(spark, sf_dir).mapInPandas(
        _fake_resize_batches, schema=RESIZE_SCHEMA
    )


FRAME_STEP = 10  # sample every k-th frame

FRAMES_SCHEMA = "doc_id long, n_frames int, frame_idx int"


def _fake_frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fake video sampler: pretend n_frames = bytes // 100 + 1,
    emit every FRAME_STEP-th frame index — a row-expanding map (1 video →
    many frames), the shape real frame extraction has."""
    for pdf in batches:
        out_doc, out_n, out_idx = [], [], []
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            n_frames = len(content) // 100 + 1
            for idx in range(0, n_frames, FRAME_STEP):
                out_doc.append(doc_id)
                out_n.append(n_frames)
                out_idx.append(idx)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "n_frames": pd.Series(out_n, dtype="int32"),
                "frame_idx": pd.Series(out_idx, dtype="int32"),
            }
        )


@register(
    "multimodal_frame_sample",
    f"""
WITH vids AS (
  SELECT doc_id, octet_length(encode(text)) // 100 + 1 AS n_frames
  FROM documents
)
SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
       CAST(unnest(range(0, n_frames, {FRAME_STEP})) AS INT) AS frame_idx
FROM vids
""",
    doc="video frame sampling plumbing (stubbed decode): 1 video → k frame rows",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling shape: a row-EXPANDING mapInPandas (one binary video
    row fans out to sampled-frame rows). Output stays Arrow-batched and
    partition-local; a real extractor adds the frame bytes per row."""
    return with_binary_content(spark, sf_dir).mapInPandas(
        _fake_frame_sample_batches, schema=FRAMES_SCHEMA
    )
