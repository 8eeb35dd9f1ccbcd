"""Multimodal column plumbing: opaque binary payloads + typed metadata.

TESTDATA has no image/audio files, so the *payload* here is the
document text re-encoded as bytes — but the Spark-side machinery is
the real thing a multimodal pipeline needs at 100 TB:

- binary columns carried as ``BinaryType`` with typed metadata
  alongside (never decoded during relational ops — predicate pushdown
  and column pruning keep payload bytes out of scans that don't need
  them);
- decode / feature-extract as Arrow-batched ``mapInPandas`` (bytes in,
  struct rows out, schema declared up front);
- the actual codec call is stubbed: ``decode_image_real`` raises
  ``NotImplementedError`` (no PIL/ffmpeg in this container), and the
  pipeline runs a deterministic fake decode with the same signature,
  so every piece of plumbing — batch shapes, schema, partitioning —
  is exercised and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, n_frames int"
)


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """Real codec entry point — requires an image library.

    STUB: this container ships no PIL/opencv/ffmpeg; wire the real
    decoder here when deploying. The pipeline below uses
    ``decode_image_fake`` (same signature, deterministic) so the
    Spark plumbing is fully testable.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this "
        "environment; use decode_image_fake for plumbing tests"
    )


def decode_image_fake(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: metadata derived from byte length."""
    n = len(payload)
    return (n % 640 + 1, (n // 640) % 480 + 1, n % 7 + 1)


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches of (doc_id, payload) → metadata.

    One pandas frame per Arrow batch — payload bytes never become
    JVM objects row-by-row; this is the pattern for real decoders.
    """
    for pdf in batches:
        meta = [decode_image_fake(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "n_frames": [m[2] for m in meta],
            }
        )


def with_payload(df: DataFrame) -> DataFrame:
    """Attach the opaque binary payload column (utf8 bytes of text)."""
    return df.withColumn("payload", F.encode("text", "UTF-8"))


@query(
    "p_multimodal_meta",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY source
    """,
)
def p_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level metadata over binary payloads, grouped by source.

    Metadata aggregation never touches payload contents — at scale the
    payload column is pruned out of this scan entirely (ReadSchema
    shows only source + the length, once stored as a real column).
    """
    d = with_payload(read_table(spark, sf_dir, "documents"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max(F.length("payload")).cast("bigint").alias("max_bytes"),
    )


@query(
    "p_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)       AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER)  AS width,
           CAST((octet_length(encode(text)) // 640) % 480 + 1 AS INTEGER)
               AS height,
           CAST(octet_length(encode(text)) % 7 + 1 AS INTEGER)    AS n_frames
    FROM documents
    """,
)
def p_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode pipeline: binary in, typed metadata out.

    Exercises the real multimodal path — mapInPandas over a binary
    column with a declared output schema — with the deterministic
    fake decoder standing in for the codec. The oracle recomputes the
    fake's arithmetic in SQL, so the *plumbing* (batching, schema,
    byte round-trip through Arrow) is what's being verified.
    """
    d = with_payload(read_table(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=DECODE_SCHEMA
    )
