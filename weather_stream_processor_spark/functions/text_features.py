"""Reusable Column-expression helpers for the LLM-pipeline operators.

Everything here is a pure Column expression (JVM codegen, Arrow-free,
UDF-free) so the operators built on top stay on the Spark fast path at any
scale. ``Column`` in, ``Column`` out.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the fixtures are space-separated word soup).

    For real corpora swap in a regex split (``F.split(text, r"\\W+")``) or a
    BPE-ish pre-tokenizer regex — the downstream operators only assume an
    ``array<string>``.
    """
    return F.split(text, " ")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array.

    Guarded so documents shorter than ``n`` tokens yield an empty set
    (Spark's ``sequence`` would otherwise count *down* for negative spans).
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """ALL word n-grams in order (non-distinct) — the multiset
    ``word_shingles`` de-duplicates. Needed where multiplicity carries the
    signal (within-document repetition measurement)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns, accumulated in double.

    The cast inside the lambda matters: zip_with on ``array<float>`` would
    otherwise multiply in float32 and drift from the (double) oracle.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two float-array columns.

    Array HOFs evaluate interpreted (outside whole-stage codegen), so this
    costs THREE array traversals per pair. In pairwise hot paths (k-NN
    joins) precompute ``l2_norm`` once per row and use
    ``dot(a, b) / (nrm_a * nrm_b)`` — identical arithmetic, one traversal
    per pair instead of three.
    """
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
