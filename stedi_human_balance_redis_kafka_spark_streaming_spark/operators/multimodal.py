"""Multimodal column plumbing (SURVEY.md §2.6).

Images/audio/video are modeled as opaque ``binary`` columns with typed
metadata structs — the schema/partitioning/UDF-signature layer is real
and tested; the actual media decode is STUBBED (codec libraries are not
in this container) behind ``NotImplementedError`` with a deterministic
byte-level fake for tests.

The decode/feature path uses ``mapInPandas`` — Arrow-batched, one Python
crossing per batch (not per row), the sanctioned slow-path shape for
operators Spark's built-ins can't express (media codecs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HIST_BINS = 16

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_hist array<double>"
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a media payload: binary blob + typed metadata struct.

    Uses the utf-8 bytes of ``text_col`` as the stand-in blob.  Output:
    (doc_id, blob binary, meta struct<n_bytes, sha256, mime>).
    Metadata is computed JVM-side (length/sha2) — only the codec work
    ever needs Python.
    """
    blob = F.col(text_col).cast("binary")
    return docs.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.length(blob).cast("long").alias("n_bytes"),
            F.lower(F.sha2(blob, 256)).alias("sha256"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def decode_media(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL media decode — stubbed: codec libraries (PIL/ffmpeg/librosa)
    are not available in this environment.  The Spark-side contract
    (schema, batching, partition flow) is exercised via
    :func:`extract_byte_features` instead.
    """
    raise NotImplementedError(
        "media codecs unavailable in this container; "
        "use extract_byte_features for the deterministic fake path"
    )


def extract_byte_features(blobs: DataFrame) -> DataFrame:
    """Deterministic fake 'feature extraction': 16-bin byte histogram.

    Stands in for an image/audio feature extractor so the full
    mapInPandas plumbing (Arrow batches, schema contract, partition
    parallelism) is real and testable.  Input: (doc_id, blob, ...).
    Output: (doc_id, n_bytes, byte_hist[16] normalized).
    """

    def _extract(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in pdf_iter:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = np.frombuffer(blob, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=N_HIST_BINS).astype("float64")
                total = hist.sum()
                out.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(blob),
                        "byte_hist": (hist / total if total else hist).tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "n_bytes", "byte_hist"])

    # Re-split before the Python stage: a single-file source yields one
    # input partition, which would serialize the whole corpus through one
    # Python worker.
    par = blobs.sparkSession.sparkContext.defaultParallelism
    return (
        blobs.select("doc_id", "blob")
        .repartition(par)
        .mapInPandas(_extract, FEATURE_SCHEMA)
    )
