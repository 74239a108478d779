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

FEATURE_LONG_SCHEMA = "doc_id long, n_bytes long, bin int, bin_count long"


def _batch_hist(pdf: pd.DataFrame):
    """Vectorized 16-bin high-nibble histogram for a whole Arrow batch.

    One ``np.bincount`` over the concatenated buffers with per-doc offset
    codes — no per-row Python loop (the round-1 per-row version spent
    34.8 s at sf0.1; this shape is bounded by memory bandwidth).
    Returns (lens[int64 m], hist[int64 m×16]).
    """
    import numpy as np

    m = len(pdf)
    blobs = pdf["blob"]
    lens = np.fromiter((len(b) for b in blobs), dtype="int64", count=m)
    arr = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    doc_idx = np.repeat(np.arange(m, dtype="int64"), lens)
    codes = doc_idx * N_HIST_BINS + (arr >> 4)
    hist = np.bincount(codes, minlength=m * N_HIST_BINS).reshape(m, N_HIST_BINS)
    return lens, hist


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
            if not len(pdf):
                continue
            lens, hist = _batch_hist(pdf)
            denom = np.where(lens > 0, lens, 1).astype("float64")
            norm = hist / denom[:, None]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": lens,
                    "byte_hist": norm.tolist(),
                }
            )

    # Re-split before the Python stage: a single-file source yields one
    # input partition, which would serialize the whole corpus through one
    # Python worker.
    par = blobs.sparkSession.sparkContext.defaultParallelism
    return (
        blobs.select("doc_id", "blob")
        .repartition(par)
        .mapInPandas(_extract, FEATURE_SCHEMA)
    )


def byte_features_long(blobs: DataFrame) -> DataFrame:
    """Driver-checkable long form of :func:`extract_byte_features`:
    one row per (doc, non-empty bin) with EXACT integer counts.

    Output: (doc_id, n_bytes, bin, bin_count) — all hashable primitives
    (the array<double> form crashes the driver's pandas canonicalizer),
    and exactly reproducible in SQL: the high nibble of each byte is the
    odd-position hex digit of the blob, so the DuckDB oracle can mirror
    it via hex(encode(text)).  Empty docs emit no rows on either side.
    """

    def _extract(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            lens, hist = _batch_hist(pdf)
            docs, bins = np.nonzero(hist)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[docs],
                    "n_bytes": lens[docs],
                    "bin": bins.astype("int32"),
                    "bin_count": hist[docs, bins],
                }
            )

    par = blobs.sparkSession.sparkContext.defaultParallelism
    return (
        blobs.select("doc_id", "blob")
        .repartition(par)
        .mapInPandas(_extract, FEATURE_LONG_SCHEMA)
    )


FRAME_BYTES = 100
SAMPLE_K = 4

FRAME_SCHEMA = "doc_id long, frame_idx long, frame_off long, frame_sig string"


def sample_frames(blobs: DataFrame) -> DataFrame:
    """Deterministic frame sampling — the video-modality fan-out shape.

    Treats each blob as a fake video of ``n_frames = n_bytes div
    FRAME_BYTES + 1`` fixed-size frames and emits ``SAMPLE_K`` evenly
    spaced frames per doc (``idx_j = j·n_frames div k``, duplicates
    collapsed for short docs) — the standard "sample k frames per clip"
    pretraining step.  ``frame_sig`` is the hex of the frame's first 16
    bytes; a real pipeline would hand the frame bytes to a codec/encoder
    exactly where the slice happens.  Output: (doc_id, frame_idx,
    frame_off, frame_sig), one row per sampled frame.

    Scale shape: mapInPandas (Arrow-batched) with k-row fan-out per doc
    — index math is numpy over the whole batch; only the k tiny
    per-frame slices touch Python objects (unlike the per-byte
    histogram, this is O(k) per doc).  Exactly reproducible in SQL from
    hex(blob), so the driver gets a full value-hash oracle.
    """

    def _sample(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            m = len(pdf)
            blobs_col = pdf["blob"]
            lens = np.fromiter((len(b) for b in blobs_col), dtype="int64", count=m)
            n_frames = lens // FRAME_BYTES + 1
            idx = (
                np.arange(SAMPLE_K, dtype="int64")[None, :] * n_frames[:, None]
            ) // SAMPLE_K
            doc_rep = np.repeat(np.arange(m), SAMPLE_K)
            flat_idx = idx.ravel()
            off = flat_idx * FRAME_BYTES
            sig = [
                bytes(blobs_col.iloc[d])[o : o + 16].hex()
                for d, o in zip(doc_rep, off)
            ]
            yield (
                pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].to_numpy()[doc_rep],
                        "frame_idx": flat_idx,
                        "frame_off": off,
                        "frame_sig": sig,
                    }
                ).drop_duplicates(["doc_id", "frame_idx"])
            )

    par = blobs.sparkSession.sparkContext.defaultParallelism
    return (
        blobs.select("doc_id", "blob")
        .repartition(par)
        .mapInPandas(_sample, FRAME_SCHEMA)
    )


GRID_W = 16
OUT_W = OUT_H = 4

RESIZE_SCHEMA = "doc_id long, n_bytes long, grid_h long, resized_hex string"


def resize_box(blobs: DataFrame) -> DataFrame:
    """Byte-level integer BOX-FILTER (area) downsample — real
    resampling math over the image-modality plumbing, no codec needed.

    Interprets each blob as a ``GRID_W``-wide byte grid (height =
    ceil(n_bytes / GRID_W), last row ragged) and area-downsamples it to
    ``OUT_H×OUT_W``: output pixel (r, c) is the truncated integer MEAN
    of its source box — rows ``[r·H div OUT_H, max((r+1)·H div OUT_H,
    r·H div OUT_H + 1))`` (the ``max`` keeps short grids, H < OUT_H,
    sampling at least one row), columns ``[c·GRID_W div OUT_W,
    (c+1)·GRID_W div OUT_W)`` — counting only bytes that exist; a box
    that falls entirely past the ragged end degrades to the last byte
    (clamp convention).  A real pipeline would decode via the codec +
    PIL/opencv right before this arithmetic (see :func:`decode_media`);
    the box-mean math, Arrow batching, and schema contract are real and
    exercised.

    Output: (doc_id, n_bytes, grid_h, resized_hex) — the 16 pixel bytes
    hex-concatenated, integer-exact hence SQL-reproducible from
    hex(blob).  Empty blobs emit no row.

    Scale shape: whole-batch numpy — per Arrow batch, blobs pad into
    one (m, H_max, GRID_W) value/mask pair whose 2-D prefix sums
    (integral images) answer all m·16 box sums and counts with a few
    fancy-indexed gathers; no per-box Python loop.  Batches are
    size-bounded by Arrow, so H_max is the batch's largest blob — fine
    for thumbnails/metadata blobs; shard oversized media first.
    """

    def _resize(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        r_ids = np.arange(OUT_H)
        c0 = (np.arange(OUT_W) * GRID_W) // OUT_W
        c1 = ((np.arange(OUT_W) + 1) * GRID_W) // OUT_W

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            keep = [
                (int(pdf["doc_id"].iloc[i]), bytes(pdf["blob"].iloc[i]))
                for i in range(len(pdf))
                if len(pdf["blob"].iloc[i]) > 0
            ]
            if not keep:
                continue
            m = len(keep)
            ids = np.array([k[0] for k in keep], dtype="int64")
            lens = np.array([len(k[1]) for k in keep], dtype="int64")
            h = -(-lens // GRID_W)  # ceil
            hmax = int(h.max())
            vals = np.zeros((m, hmax * GRID_W), dtype="int64")
            mask = np.zeros((m, hmax * GRID_W), dtype="int64")
            for i, (_, blob) in enumerate(keep):
                vals[i, : lens[i]] = np.frombuffer(blob, dtype=np.uint8)
                mask[i, : lens[i]] = 1
            # integral images with a zero border: S[i, r, c] = sum of
            # grid[:r, :c] — each box sum is 4 gathered corners
            def integral(x):
                s = np.zeros((m, hmax + 1, GRID_W + 1), dtype="int64")
                s[:, 1:, 1:] = x.reshape(m, hmax, GRID_W).cumsum(1).cumsum(2)
                return s
            sv, sm = integral(vals), integral(mask)
            r0s = (r_ids[None, :] * h[:, None]) // OUT_H  # (m, OUT_H)
            r1s = np.maximum(
                ((r_ids[None, :] + 1) * h[:, None]) // OUT_H, r0s + 1
            )
            rows_m = np.arange(m)[:, None]
            def box(s):
                hi = s[rows_m, r1s, :]  # (m, OUT_H, GRID_W+1)
                lo = s[rows_m, r0s, :]
                return (
                    (hi[:, :, c1] - hi[:, :, c0])
                    - (lo[:, :, c1] - lo[:, :, c0])
                )  # (m, OUT_H, OUT_W)
            sums, cnts = box(sv), box(sm)
            last = vals[rows_m[:, 0], lens - 1][:, None, None]
            pix = np.where(
                cnts > 0, sums // np.maximum(cnts, 1), last
            ).reshape(m, OUT_H * OUT_W)
            sigs = [bytes(pix[i].tolist()).hex() for i in range(m)]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": lens,
                    "grid_h": h,
                    "resized_hex": sigs,
                }
            )

    par = blobs.sparkSession.sparkContext.defaultParallelism
    return (
        blobs.select("doc_id", "blob")
        .repartition(par)
        .mapInPandas(_resize, RESIZE_SCHEMA)
    )


WIN_SAMPLES = 100

ENERGY_SCHEMA = (
    "doc_id long, win_idx long, n_samples long, energy long, peak long"
)


def audio_energy(blobs: DataFrame) -> DataFrame:
    """Deterministic fake audio analysis — the audio-modality plumbing.

    Interprets each blob as 8-bit unsigned PCM (center 128) and emits
    per-window signal statistics over fixed ``WIN_SAMPLES``-sample
    windows (the last window may be short): sample count, total energy
    Σ(b−128)² and peak amplitude max|b−128| — the silence-trim /
    voice-activity-gate shape of an audio pretraining pipeline.  A real
    pipeline would decode the codec right before the windowing (see
    :func:`decode_media`); everything downstream of the decode is real.

    Output: (doc_id, win_idx, n_samples, energy, peak) — all exact
    integers, SQL-reproducible from hex(blob) byte extraction, so the
    driver gets a full value-hash oracle.

    Scale shape: mapInPandas with whole-batch numpy — ONE
    ``np.add.reduceat`` over the concatenated sample buffer computes
    every window of every doc in the batch (windows tile the buffer
    contiguously, so reduceat's [start_i, start_{i+1}) segments are
    exactly the windows); no per-row Python loop anywhere.
    """

    def _energy(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            raw = [bytes(b) for b in pdf["blob"]]
            ids_all = pdf["doc_id"].to_numpy()
            keep = [i for i, b in enumerate(raw) if len(b)]
            if not keep:
                continue
            ids = ids_all[keep]
            bufs = [raw[i] for i in keep]
            lens = np.fromiter((len(b) for b in bufs), dtype="int64", count=len(keep))
            arr = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype("int64") - 128
            n_wins = -(-lens // WIN_SAMPLES)  # ceil
            doc_rep = np.repeat(np.arange(len(keep), dtype="int64"), n_wins)
            win_idx = np.arange(n_wins.sum(), dtype="int64") - np.repeat(
                np.concatenate(([0], np.cumsum(n_wins)[:-1])), n_wins
            )
            doc_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
            starts = doc_off[doc_rep] + win_idx * WIN_SAMPLES
            energy = np.add.reduceat(arr * arr, starts)
            peak = np.maximum.reduceat(np.abs(arr), starts)
            n_samples = np.minimum(
                WIN_SAMPLES, lens[doc_rep] - win_idx * WIN_SAMPLES
            )
            yield pd.DataFrame(
                {
                    "doc_id": ids[doc_rep],
                    "win_idx": win_idx,
                    "n_samples": n_samples,
                    "energy": energy,
                    "peak": peak,
                }
            )

    par = blobs.sparkSession.sparkContext.defaultParallelism
    return (
        blobs.select("doc_id", "blob")
        .repartition(par)
        .mapInPandas(_energy, ENERGY_SCHEMA)
    )


PHASH_BITS = 64  # fixed: the fingerprint is carried as four 16-bit chunks

PHASH_SCHEMA = "doc_id long, n_bytes long, c0 long, c1 long, c2 long, c3 long"


def blockhash(blobs: DataFrame) -> DataFrame:
    """Perceptual block-hash over the byte signal — the binary-modality
    member of the dedup fingerprint family (text has SimHash/MinHash,
    embeddings have IVF buckets; media blobs get the classic
    blockhash/aHash): split each blob into 64 equal byte blocks and set
    bit j when block j's mean exceeds the whole-blob mean.  Byte-VALUE
    perturbations (re-encode noise, small in-place edits) flip few
    bits; LENGTH changes shift every block boundary, so — exactly as
    with real 2-D blockhash, which hashes a fixed-size resized image —
    length normalization is the decode/resize stage's job
    (:func:`resize_box`), not the hash's.

    Exact integer arithmetic (bit j = block_sum·n > total·block_len —
    no division), so the DuckDB oracle replays it bit-for-bit from the
    blob hex.  int64-safe while 255·n² < 2⁶³ (n ≲ 190 MB per blob).
    Empty blobs are dropped (no signal to hash; exact dedup handles
    them by digest).

    The 64-bit fingerprint is carried as FOUR 16-bit chunk values
    (c0..c3, bit j lives in chunk j div 16 at position j mod 16): the
    packed form would not fit a signed int64 without sign games, and
    the pigeonhole pair join (:func:`phash_near_dup_pairs`) needs the
    chunks anyway.

    Whole-batch numpy in Arrow-batched ``mapInPandas`` (the module's
    sanctioned shape): per batch, one concatenated prefix-sum array
    answers all m·64 block sums via fancy-indexed gathers — no per-row
    Python.  Output: (doc_id, n_bytes, c0..c3).
    """

    def _hash(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            lens0 = np.fromiter(
                (len(b) for b in pdf["blob"]), dtype="int64", count=len(pdf)
            )
            pdf = pdf[lens0 > 0]
            m = len(pdf)
            if not m:
                continue
            blobs_ = pdf["blob"]
            lens = lens0[lens0 > 0]
            arr = np.frombuffer(b"".join(blobs_), dtype=np.uint8).astype(
                "int64"
            )
            offs = np.zeros(m + 1, dtype="int64")
            np.cumsum(lens, out=offs[1:])
            pre = np.zeros(arr.size + 1, dtype="int64")
            np.cumsum(arr, out=pre[1:])
            j = np.arange(PHASH_BITS + 1, dtype="int64")
            # per-doc block boundaries: offs[d] + (j * n_d) div 64
            bnd = offs[:m, None] + (j[None, :] * lens[:, None]) // PHASH_BITS
            bsum = pre[bnd[:, 1:]] - pre[bnd[:, :-1]]
            blen = bnd[:, 1:] - bnd[:, :-1]
            total = pre[offs[1:]] - pre[offs[:m]]
            bits = (bsum * lens[:, None] > total[:, None] * blen).astype(
                "int64"
            )
            w = 1 << np.arange(16, dtype="int64")
            out = {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": lens,
            }
            for t in range(4):
                out[f"c{t}"] = (bits[:, 16 * t : 16 * t + 16] * w).sum(axis=1)
            yield pd.DataFrame(out)

    par = blobs.sparkSession.sparkContext.defaultParallelism
    return (
        blobs.select("doc_id", "blob")
        .repartition(par)
        .mapInPandas(_hash, PHASH_SCHEMA)
    )


def phash_near_dup_pairs(blobs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Binary-modality near-dup pairs by blockhash Hamming distance ≤
    ``max_hamming`` — the media counterpart of dedup.simhash_pairs,
    with the same pigeonhole completeness argument: a pair within
    distance d ≤ 3 differs in ≤ 3 bits, which can touch at most 3 of
    the fingerprint's four 16-bit chunks, so at least one chunk
    matches exactly.  Candidates join on (chunk index, chunk value)
    buckets — linear like a banded LSH, never all-pairs — then verify
    with bit_count(xor) per chunk, making the result exactly the
    brute-force Hamming ball (the DuckDB oracle runs brute force).

    ``max_hamming`` > 3 would need more chunks than the four the
    fingerprint carries (pigeonhole breaks) — RAISES rather than
    silently missing pairs.  Output: (doc_a, doc_b, hamming).
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming must be in [0, 3] (the 4-chunk pigeonhole "
            f"bound); got {max_hamming}"
        )
    fp = blockhash(blobs)
    chunk_keys = [
        F.concat(F.lit(f"{i}:"), F.col(f"c{i}").cast("string"))
        for i in range(4)
    ]
    chunks = fp.select(
        "doc_id",
        *[f"c{i}" for i in range(4)],
        F.explode(F.array(*chunk_keys)).alias("chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = sum(
        F.bit_count(
            F.col(f"a.c{i}").bitwiseXOR(F.col(f"b.c{i}"))
        )
        for i in range(4)
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )
