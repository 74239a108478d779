"""Deterministic, cross-engine hashing & shingling primitives.

Everything is built on ``md5`` because it is the one hash Spark and DuckDB
share bit-for-bit — that lets every dedup operator keep an exact SQL
oracle (the driver's correctness gate).  At cluster scale md5-as-string is
~2× slower than ``xxhash64``; swap ``MINHASH_HASH_FN`` for xxhash64 when
oracle parity is not required.

All shingling/hashing is higher-order Column expressions (``transform``,
``aggregate``) — JVM-side, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (lower-cased, trimmed)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Distinct n-grams from an ALREADY-PROJECTED token-array column.

    ``t`` must be a plain column reference (project ``tokens(...)`` into a
    named column first).  Interpreted higher-order lambdas re-evaluate
    their argument subtree per element, so passing the raw
    ``split(trim(lower(text)))`` expression here makes shingling
    O(tokens²) per document — measured minutes instead of seconds on a
    5k-doc corpus.

    Built on ``slice`` (bounds-safe) rather than ``element_at`` (which
    raises under ANSI mode, the Spark 4 default, on out-of-range indexes).
    Texts with fewer than ``n`` tokens yield an empty array.
    """
    idx = F.when(F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - n + 1)).otherwise(
        F.array().cast("array<integer>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    )


def token_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct token n-grams straight from a text column.

    Convenience form for small inputs/tests; hot paths should project
    ``tokens(text)`` first and call :func:`shingles_from_tokens` (see its
    docstring for the quadratic-re-evaluation trap).
    """
    return shingles_from_tokens(tokens(text), n)


def _seeded_md5(seed: int):
    """One-arg lambda factory.  NB: PySpark infers higher-order-function
    arity from the Python signature, so a ``lambda s, i=i:`` closure
    trick silently becomes the two-arg (element, index) form — the seed
    must be captured via a real closure."""
    prefix = f"{seed}:"

    def fn(s: Column) -> Column:
        return F.md5(F.concat(F.lit(prefix), s).cast("binary"))

    return fn


def minhash_signature(shingles: Column, num_hashes: int = 8) -> Column:
    """MinHash signature: per seed i, the lexicographic min of
    ``md5(i ':' shingle)`` over the shingle set.

    Min-of-a-uniform-hash per seed is the classic MinHash estimator;
    using the hex string (not an int) keeps it bit-identical in DuckDB.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, _seeded_md5(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )


def lsh_band_keys(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each band of the signature to a bucket key.

    Docs sharing any band bucket become candidate pairs; P[candidate] =
    1-(1-J^r)^b, the standard S-curve.
    """
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            ).alias(f"band{b}")
            for b in range(num_bands)
        ]
    )


def simhash16(text: Column | str) -> Column:
    """16-bit SimHash over whitespace tokens.

    Bit j comes from hex digit j of each token's md5: digits 8-f vote +1,
    0-7 vote -1; the fingerprint sets bit j when the vote sum is positive.
    16 bits is deliberately narrow so the same computation is cheap to
    mirror in the SQL oracle; widen by reading more hex digits.
    """
    def _vote_fn(j: int):
        def fn(acc: Column, tok: Column) -> Column:
            return acc + F.when(
                F.substring(F.md5(tok.cast("binary")), j + 1, 1) >= "8", 1
            ).otherwise(-1)

        return fn

    t = tokens(text)
    bits = []
    for j in range(16):
        vote = F.aggregate(t, F.lit(0), _vote_fn(j))
        bits.append(F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def span_positions(t: Column, n: int = 5) -> Column:
    """POSITIONAL n-gram spans (duplicates kept — one entry per start
    position) from an already-projected token-array column; the
    non-distinct sibling of :func:`shingles_from_tokens`, for
    boilerplate-fraction math where every position counts.  Same
    bounds-safe ``slice`` construction; < n tokens yields empty."""
    idx = F.when(F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - n + 1)).otherwise(
        F.array().cast("array<integer>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
