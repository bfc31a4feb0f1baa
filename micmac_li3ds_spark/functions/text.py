"""Text-pipeline column builders shared by the M5 operators.

Tokenization, shingling, and cross-engine-stable hashing. The corpus
``documents.text`` is space-separated word soup (FIXTURES.md §2), so the
whitespace tokenizer is exact.

Hashing notes:
- ``token_hash32``: md5-based 32-bit hash — md5 is identical in Spark
  and DuckDB, so simhash/fingerprint values computed from it are
  cross-engine comparable (the oracle can recompute them).
- MinHash permutations use xxhash64 (Spark-internal only): candidate
  generation never needs oracle parity because candidates are verified
  with exact Jaccard before leaving the operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2147483647  # 2^31 - 1


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined). Empty array when the
    document has fewer than n tokens (guarded: Spark's sequence(1,0)
    counts *down*, unlike DuckDB's empty range)."""
    size = F.size(toks)
    idx = F.sequence(F.lit(1), size - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(size >= n, F.array_distinct(F.transform(idx, gram))).otherwise(
        F.array().cast("array<string>")
    )


def token_hash32(tok: Column) -> Column:
    """First 8 hex digits of md5 as a bigint — reproducible in DuckDB via
    duck_token_hash32()."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def duck_token_hash32(expr: str) -> str:
    """DuckDB spelling of token_hash32 (hex→int fold; DuckDB lacks a
    hex-string-to-integer cast)."""
    return (
        f"list_reduce(list_transform(string_split(substr(md5({expr}), 1, 8), ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"
    )


def minhash32(tok: Column) -> Column:
    """Spark-internal 31-bit base hash for MinHash permutations."""
    return F.pmod(F.xxhash64(tok), F.lit(MERSENNE31))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays (int ratio —
    bit-identical across engines)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / union


DUCK_SHINGLES_CTE = """
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(t) - 2, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM toks
)
"""
