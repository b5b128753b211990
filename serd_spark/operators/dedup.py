"""Deduplication operators over the ``documents`` table: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale design: every variant is bucket-first — candidate pairs only
ever form *inside* a bounded bucket (hash group, LSH band bucket),
never via an all-pairs cross join.  At 100 TB the band buckets are the
unit of shuffle; hot buckets are bounded by ``max_bucket`` (oversized
buckets are dropped with a logged count — the standard LSH guardrail)
and AQE skew-join handles residual imbalance.

Definitions are engine-portable (md5-based hashing, explicit shingle
construction) so each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy: one representative
    (min doc_id) per distinct text + duplicate count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min("doc_id").cast("long").alias("rep_doc_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


def shingles_col(text_col, k: int = 3):
    """k-word shingles as an array column (portable construction:
    split on whitespace, join adjacent k words)."""
    toks = F.split(F.trim(text_col), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]),
    )


def minhash_bands(
    docs: DataFrame, text_col: str = "text", n_bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document band minhashes: band b's signature =
    min(md5(shingle || '#' || b)).  One row per (doc, band)."""
    sh = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(shingles_col(F.col(text_col), shingle_k)).alias("shingle"),
    )
    bands = sh.select(
        "doc_id", "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    )
    return (
        bands.groupBy("doc_id", "band")
        .agg(F.min(F.md5(F.concat_ws("#", "shingle", "band")))
             .alias("minhash"))
    )


def minhash_lsh_pairs(
    docs: DataFrame, text_col: str = "text", n_bands: int = 8,
    shingle_k: int = 3, max_bucket: int = 64,
) -> DataFrame:
    """Candidate near-duplicate pairs: documents sharing ≥1 band
    bucket.  Bucket-bounded self-join (the LSH scale path)."""
    mh = minhash_bands(docs, text_col, n_bands, shingle_k)
    # Guardrail: drop degenerate hot buckets (> max_bucket docs).
    sized = mh.withColumn(
        "bucket_n",
        F.count("*").over(Window.partitionBy("band", "minhash")),
    ).where(F.col("bucket_n") <= max_bucket)
    a = sized.select("band", "minhash", F.col("doc_id").alias("doc_a"))
    b = sized.select("band", "minhash", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "minhash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame, text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (verify
    stage after LSH): |A∩B| / |A∪B| over distinct shingles."""
    sh = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(shingles_col(F.col(text_col), shingle_k)).alias("shingle"),
    ).distinct()
    a = sh.select(F.col("doc_id").alias("doc_a"),
                  F.col("shingle").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"),
                  F.col("shingle").alias("sh_a"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter_n = (
        pairs
        .join(a, "doc_a")
        .join(b, ["doc_b", "sh_a"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    return (
        inter_n
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_sh").alias("n_b")), "doc_b")
        .select(
            "doc_a", "doc_b", "n_inter",
            F.round(F.col("n_inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                    6).alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, text_col: str = "text",
            n_bits: int = 16) -> DataFrame:
    """Per-document SimHash over whitespace tokens: bit i of the
    signature is the majority vote of token-hash bit i.  Token hash =
    first 4 hex chars of md5 (16 bits) — portable to the SQL oracle."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        .alias("tok"),
    )
    h = toks.withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long"))
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1,
                       1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(n_bits)
        ]
    )
    sig = sum(
        (F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
         for i in range(n_bits)),
        F.lit(0),
    )
    return votes.select("doc_id", sig.cast("long").alias("simhash"))
