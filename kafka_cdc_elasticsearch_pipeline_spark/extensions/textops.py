"""Shared text primitives for the dedup/text-analysis operators.

Everything is a JVM-side Catalyst expression (higher-order array
functions) — document-at-a-time Python would be the classic mistake
here; at 100 TB these run inside whole-stage codegen with zero
serialization.

The hash primitives are chosen to be *portable*: the DuckDB oracles
compute the identical values, so even the randomized-flavored
algorithms (MinHash, SimHash) are exactly checkable:

- md5 (hex) exists in both engines and a lexicographic MIN over
  fixed-width hex strings equals the numeric MIN — that makes
  ``min(md5(shingle || '#' || i))`` a valid i-th MinHash permutation
  with no custom hashing at all.
- a 16-bit polynomial rolling hash ``fold(chars, h*31+ord(c) mod 2^16``
  is expressible with array folds in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NUM_MINHASH = 8  # k signature components
LSH_ROWS_PER_BAND = 2  # r -> b = k/r = 4 bands


# Re-exported from the source layer: repartition-if-under-split, used
# here ahead of compute-heavy per-row pipelines (digests, char folds,
# shingling). See sources.tables.spread for the rationale/measurements.
from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import spread  # noqa: E402, F401


# Re-exported for the dedup/similarity family: no-op reuse marker with
# an opt-in pinned mode — see operators.caching for rationale and the
# measured persist-vs-lazy numbers.
from kafka_cdc_elasticsearch_pipeline_spark.operators.caching import (  # noqa: E402, F401
    release_pinned,
    reuse,
)


def explode_expensive(df, array_col: str, out_col: str, pos_col: str | None = None):
    """Explode an array built by an expensive expression pipeline.

    Uses the *_outer generator + null filter instead of plain
    explode/posexplode: with whole-stage codegen, the inner-explode
    path re-evaluates a codegen-fallback generator input (HOF
    transforms, digests) per OUTPUT row — measured 8.6s vs 0.38s on
    the sf0.1 shingle explode. The outer variant runs the interpreted
    Generate, which evaluates the array once per input row; the null
    filter restores inner semantics (drops empty/null arrays).
    """
    if pos_col is not None:
        gen = F.posexplode_outer(array_col).alias(pos_col, out_col)
    else:
        gen = F.explode_outer(array_col).alias(out_col)
    other = [c for c in df.columns if c != array_col]
    return df.select(*other, gen).filter(F.col(out_col).isNotNull())


def words(text: Column | str) -> Column:
    """Lowercased whitespace tokenization (mirrors
    ``string_split_regex(lower(text), '\\s+')``)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), r"\s+")


def shingles(words_col: str = "w", n: int = 3) -> Column:
    """Distinct word n-gram shingles from a words-array column.

    1-based element_at to mirror DuckDB list indexing; callers filter
    ``size(w) >= n`` first (sequence() would run backwards otherwise).
    """
    parts = ", ".join(
        f"element_at({words_col}, i + {j})" for j in range(n)
    )
    return F.expr(
        f"array_distinct(transform(sequence(1, size({words_col}) - {n - 1}),"
        f" i -> concat_ws(' ', {parts})))"
    )


#: p and the affine constants for the k permutation functions
#: h_i(x) = (A[i]*x + B[i]) mod MINHASH_P.  One md5 per shingle gives a
#: 28-bit base hash; products stay < 2^59, so the arithmetic is exact
#: (and identical) in both Spark and DuckDB BIGINTs — no overflow
#: divergence, 8× fewer digest calls than hashing per-permutation.
MINHASH_P = 2147483647  # 2^31 - 1 (prime)
MINHASH_A = (1103515245, 1299709, 104729, 15485863, 32452843, 49979687, 67867967, 86028121)
MINHASH_B = (12345, 7919, 104723, 999331, 50331653, 25165843, 12582917, 6291469)


def base_hashes(shingles_col: str = "sh") -> Column:
    """array<bigint> of 28-bit base hashes: first 7 hex chars of
    md5(shingle). The ONLY digest pass — permutations derive from it."""
    return F.expr(
        f"transform({shingles_col},"
        " s -> cast(conv(substr(md5(s), 1, 7), 16, 10) as bigint))"
    )


def minhash_signature(hashes_col: str = "hs", k: int = NUM_MINHASH) -> list[Column]:
    """k MinHash components over a precomputed base-hash array:
    sig_i = min over shingles of (A[i]*h + B[i]) mod p. Cheap integer
    folds — the md5 cost is paid once in ``base_hashes``."""
    return [
        F.array_min(
            F.expr(
                f"transform({hashes_col},"
                f" h -> (h * {MINHASH_A[i]}L + {MINHASH_B[i]}L) % {MINHASH_P}L)"
            )
        ).alias(f"sig{i}")
        for i in range(k)
    ]


def poly_hash16(col_expr: str) -> str:
    """SQL expression: 16-bit polynomial hash of a string column.

    fold over codepoints: h = (h*31 + ord(c)) mod 65536. Empty chars
    are filtered (Spark's split('','') edge) so both engines agree.
    """
    return (
        f"aggregate(filter(split({col_expr}, ''), c -> c <> ''),"
        f" 0, (a, c) -> (a * 31 + ascii(c)) % 65536)"
    )


SIMHASH_BITS = 60  # fits BIGINT with headroom in both engines


def word_hashes60(words_col: str = "w") -> Column:
    """array<bigint> of 60-bit word hashes (15 hex chars of md5) —
    portable and collision-sparse; 16-bit polynomial hashes were
    measured to concentrate SimHash values so badly that near-pair
    output grew quadratically with corpus size."""
    return F.expr(
        f"transform(filter({words_col}, x -> x <> ''),"
        " x -> cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint))"
    )


def simhash60(hashes_col: str = "hs") -> Column:
    """60-bit SimHash over an array of word hashes: per-bit majority
    vote of ±1 contributions, then reassemble the sign bits.

    This is the EXECUTABLE SPEC (and the shape the DuckDB oracle
    mirrors); the hot path uses the Arrow-vectorized twin
    ``dedup._simhash60_arrow`` — the nested HOF here evaluates
    interpreted (60 re-folds of the array per doc, ~150 µs/doc at
    80k docs). A unit test pins the two equal on every fixture doc."""
    return F.expr(
        f"""aggregate(sequence(0, {SIMHASH_BITS - 1}), 0L, (acc, b) -> acc +
             IF(aggregate({hashes_col}, 0,
                  (s, h) -> s + IF(shiftright(h, b) % 2 = 1, 1, -1)) > 0,
                shiftleft(1L, b), 0L))"""
    )


def dot64(a: Column, b: Column) -> Column:
    """Dot product of two array<float> columns as an exact left-fold in
    index order (binary-identical to the oracle's list_reduce)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    return dot64(a, b) / (F.sqrt(dot64(a, a)) * F.sqrt(dot64(b, b)))


# The DuckDB-side twins, as SQL fragment builders (kept next to the
# Spark expressions so drift is visible in review).

SQL_POLY16 = (
    "list_reduce(list_prepend(0, list_transform("
    "list_filter(string_split({col}, ''), c -> c <> ''),"
    " c -> ord(c))), (a, c) -> (a * 31 + c) % 65536)"
)
SQL_DOT64 = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64),"
    " i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (x, y) -> x + y)"
)
