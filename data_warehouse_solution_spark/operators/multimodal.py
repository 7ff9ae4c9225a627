"""Multimodal column operators (SURVEY §2.C): image/audio/video
payloads as opaque BinaryType columns with typed metadata, processed
by Arrow-batched pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the DECODE step is
stubbed two ways (clearly marked):

- ``decode_image_stub``  raises NotImplementedError — the real
  integration point (swap in PIL/torchvision on a real cluster);
- ``fake_decode_features`` derives deterministic pseudo-features from
  the payload bytes — keeps the whole distributed pipeline (schema,
  partitioning, UDF signature, Arrow batch shape) real and testable.

The binary plumbing itself (construction, length/digest metadata,
batched UDF traversal) is fully real and differentially tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load_tables, spread

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image_stub(payload: bytes) -> "object":
    """REAL DECODER GOES HERE. The container ships no image codecs;
    on a production cluster replace with e.g. PIL.Image.open. Kept as
    an explicit NotImplementedError so nothing silently fakes
    decoding in a real deployment."""
    raise NotImplementedError(
        "image decoding requires an image library (PIL/opencv) not present "
        "in this environment; use fake_decode_features for pipeline tests"
    )


def fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode+embed: sha256 bytes mapped to
    [0,1) doubles. Same contract as a real feature extractor
    (bytes -> fixed-dim vector), fully reproducible."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 256.0 for i in range(dim)]


def extract_features_mapinpandas(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Distributed feature extraction: mapInPandas streams Arrow
    batches through Python once per partition — the correct shape for
    a decode stage at 100 TB (no per-row serde, no driver collection,
    partition-parallel).

    The closure is deliberately self-contained (stdlib imports only,
    feature fn redefined inside): executor Python workers must not
    need this package importable on their sys.path.
    """
    dim = FEATURE_DIM  # captured by value

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        def decode(payload: bytes) -> list[float]:
            digest = hashlib.sha256(payload).digest()
            return [digest[i] / 256.0 for i in range(dim)]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_bytes": pdf[payload_col].map(len).astype("int64"),
                    "features": pdf[payload_col].map(decode),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


@query(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS payload_bytes,
           sha256(text) AS payload_sha,
           CASE WHEN octet_length(CAST(text AS BLOB)) >= 256 THEN 'large' ELSE 'small' END
             AS size_class
    FROM documents
    """,
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over a BinaryType payload column (payloads
    synthesized from text since fixtures carry no media): length,
    digest, size class. At scale, metadata lives beside the blob so
    filters prune without touching payload bytes."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("payload_bytes"),
        F.sha2(F.col("text"), 256).alias("payload_sha"),
        F.when(F.octet_length(payload) >= 256, "large").otherwise("small").alias("size_class"),
    )


@query("multimodal_feature_extract")  # pandas-UDF pipeline: rows-only; determinism unit-tested
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: binary payload column ->
    mapInPandas feature extraction (stubbed decode) -> typed
    ArrayType(Double) feature column -> per-dimension aggregate.
    Everything except the codec call is the real 100 TB shape."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    with_payload = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    feats = extract_features_mapinpandas(with_payload)
    return (
        feats.select("doc_id", "payload_bytes", F.posexplode("features").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("v"), 6).alias("mean_feature"),
        )
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx
    FROM (
      SELECT doc_id, unnest(generate_series(0, octet_length(CAST(text AS BLOB)) - 1, 100))
               AS frame_idx
      FROM documents
    ) t
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit one row
    per sampled offset (every 100th byte position stands in for every
    Nth frame). Pure sequence+explode — the real sampler swaps the
    stride for a timestamp index without changing the plan shape."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    payload = F.encode(F.col("text"), "UTF-8")
    # guard the empty payload: sequence(0, -1, 100) raises in Spark
    # while the oracle's generate_series is silently empty
    idx = F.when(
        F.octet_length(payload) >= 1,
        F.sequence(F.lit(0), F.octet_length(payload) - 1, F.lit(100)),
    ).otherwise(F.array().cast("array<int>"))
    return d.select("doc_id", F.explode(idx).alias("frame_idx"))


@query("multimodal_resize_stub")  # stubbed codec: rows-only; determinism tested
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing for image-like payloads: mapInPandas rewrites
    each binary payload to a fixed-size representation (stride
    sampling stands in for pixel downsampling — the real codec swaps
    into the same batch loop). Output: doc_id, original and resized
    byte counts, and a digest of the resized payload for determinism
    checks. Closure is self-contained."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    with_payload = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    target = 64  # resized payload size in bytes

    def run(batches):
        import hashlib

        import pandas as pd

        def resize(payload: bytes) -> bytes:
            if len(payload) <= target:
                return payload.ljust(target, b"\0")
            stride = len(payload) / target
            return bytes(payload[int(i * stride)] for i in range(target))

        for pdf in batches:
            resized = pdf["payload"].map(resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": pdf["payload"].map(len).astype("int64"),
                    "resized_bytes": resized.map(len).astype("int64"),
                    "resized_sha": resized.map(lambda b: hashlib.sha256(b).hexdigest()),
                }
            )

    schema = "doc_id long, orig_bytes long, resized_bytes long, resized_sha string"
    return with_payload.mapInPandas(run, schema)
