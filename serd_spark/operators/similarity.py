"""Similarity search over the ``embeddings`` table
(vec_id, embedding: array<float>, label).

- ``cosine_topk``: brute-force top-k cosine neighbors — the exactness
  baseline.  Dot products run JVM-side via zip_with/aggregate (no
  Python); the query vector set is broadcast, so the big side never
  shuffles.  Similarities are rounded to 6 dp so results are portable
  to the DuckDB oracle (list_cosine_similarity).

- ``srp_lsh_buckets`` / ``srp_ann_topk``: the scale path — signed
  random projections (hyperplanes derived deterministically from md5,
  no RNG state) bucket vectors into Hamming cells; top-k runs inside
  (bucket ∪ 1-bit-flip neighbor buckets), bounding the join instead of
  an all-pairs product.  At 100 TB: buckets are the shuffle key,
  multi-probe keeps recall, hot cells bounded by max_bucket.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is a small DataFrame with the same schema (broadcast).
    Output: (query_id, neighbor_id, sim) with rank ≤ k, self excluded,
    deterministic order (sim desc, neighbor_id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    e = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("ev"),
    )
    joined = e.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id"))
    sim = F.round(
        _dot(F.col("ev"), F.col("qv"))
        / (_norm(F.col("ev")) * _norm(F.col("qv"))), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim",
                F.col("rank").cast("long").alias("rank"))
    )


def _hyperplanes(table: int, n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes from blake2 — a pure
    function of (table, plane, dim) so every executor/retry agrees."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(0, dim, 32):
            h = hashlib.blake2b(f"srp:{table}:{p}:{d}".encode(),
                                digest_size=4).digest()
            bits = int.from_bytes(h, "little")
            for j in range(min(32, dim - d)):
                row.append(1.0 if (bits >> j) & 1 else -1.0)
        planes.append(row)
    return planes


def srp_lsh_buckets(
    emb: DataFrame, n_planes: int = 5, n_tables: int = 6,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table SRP LSH: for each of L independent tables, bucket =
    sign bits against that table's hyperplanes.  One output row per
    (vector, table) — the classic L-tables recall/cost dial.  All dot
    products are JVM-side literal-array expressions."""
    dim = len(emb.select(vec_col).first()[0])
    v = F.col(vec_col).cast("array<double>")
    per_table = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for i, plane in enumerate(_hyperplanes(t, n_planes, dim)):
            lit_plane = F.array(*[F.lit(x) for x in plane])
            bit = F.when(_dot(v, lit_plane) >= 0, F.lit(1 << i)).otherwise(0)
            bucket = bucket + bit
        per_table.append(F.struct(F.lit(t).alias("tbl"),
                                  bucket.alias("bucket")))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.explode(F.array(*per_table)).alias("tb"),
    ).select("vec_id", "embedding",
             F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))


def srp_ann_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10, n_planes: int = 5,
    n_tables: int = 6, id_col: str = "vec_id", vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share a bucket in ≥1 of the L
    tables (plus 1-bit-flip probes when multiprobe).  The join is
    bounded by bucket size — the ANN scale path."""
    b_emb = srp_lsh_buckets(emb, n_planes, n_tables, id_col, vec_col)
    b_q = srp_lsh_buckets(queries, n_planes, n_tables, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        "tbl",
        F.col("bucket").alias("q_bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("q_bucket"),
            *[F.col("q_bucket").bitwiseXOR(F.lit(1 << i))
              for i in range(n_planes)],
        )
        b_q = b_q.withColumn("bucket", F.explode(probes))
    else:
        b_q = b_q.withColumn("bucket", F.col("q_bucket"))
    cand = b_emb.join(F.broadcast(b_q.drop("q_bucket")),
                      ["tbl", "bucket"]).where(
        F.col("vec_id") != F.col("query_id"))
    sim = F.round(
        _dot(F.col("embedding").cast("array<double>"),
             F.col("q_embedding").cast("array<double>"))
        / (_norm(F.col("embedding").cast("array<double>"))
           * _norm(F.col("q_embedding").cast("array<double>"))), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("sim", sim)
        .dropDuplicates(["query_id", "vec_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "sim",
                F.col("rank").cast("long").alias("rank"))
    )


def ann_recall_vs_exact(emb: DataFrame, queries: DataFrame, k: int = 10,
                        n_planes: int = 5, n_tables: int = 6) -> float:
    """Recall@k of the ANN path against brute force (quality metric)."""
    exact = cosine_topk(emb, queries, k)
    ann = srp_ann_topk(emb, queries, k, n_planes, n_tables)
    hits = exact.join(ann, ["query_id", "neighbor_id"]).count()
    total = exact.count()
    return hits / total if total else math.nan


def embedding_neardup(
    emb: DataFrame, tau: float = 0.45,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, sim) with
    sim ≥ tau, a < b (the dedup-by-embedding variant).

    This is the *exact* formulation (upper-triangle self-join with the
    smaller side broadcast).  At 100 TB the candidate generation runs
    through SRP-LSH buckets first (``srp_ann_topk``'s banding) so the
    pair space is bucket-bounded, and this exact cosine is the verify
    stage over candidates — same staging as MinHash→Jaccard in
    ``operators/dedup.py``."""
    # Norms precomputed once per VECTOR (n ops), not once per pair
    # (n² ops) — the division stays at the end so the float path (and
    # the round(…,6) result) is identical to the SQL oracle's.
    a = emb.select(F.col(id_col).alias("vec_a"),
                   F.col(vec_col).cast("array<double>").alias("va")) \
           .withColumn("na", _norm(F.col("va")))
    b = emb.select(F.col(id_col).alias("vec_b"),
                   F.col(vec_col).cast("array<double>").alias("vb")) \
           .withColumn("nb", _norm(F.col("vb")))
    pairs = a.crossJoin(F.broadcast(b)).where(
        F.col("vec_a") < F.col("vec_b"))
    sim = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        pairs.select("vec_a", "vec_b", sim.alias("sim"))
        .where(F.col("sim") >= tau)
    )


def ivf_assign(
    emb: DataFrame, n_cells: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: centroids are a deterministic sample of
    the corpus (lowest md5(vec_id) — stable under partitioning and
    retries, no iterative k-means needed for a coarse partitioner);
    every vector is assigned to its max-cosine centroid.

    Returns (assigned, centroids): ``assigned`` = emb + ``cell``
    column; the inverted file is the implicit (cell → vectors)
    grouping.  At 100 TB ``assigned`` is written bucketed by ``cell``
    so probes prune partitions."""
    v = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    cents = (
        v.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h").limit(n_cells)
        .select(F.row_number().over(
                    Window.orderBy("_h")).cast("long").alias("cell"),
                F.col("v").alias("cv"))
        .withColumn("cn", _norm(F.col("cv")))
    )
    scored = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "cell",
        (_dot(F.col("v"), F.col("cv"))
         / (_norm(F.col("v")) * F.col("cn"))).alias("csim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cell").asc())
    assigned = (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1).drop("_r", "csim")
    )
    return assigned, cents


def ivf_ann_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10, n_cells: int = 16,
    n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``n_probe``
    nearest cells and ranks exact cosine only within them — the
    classic inverted-file ANN next to the SRP-LSH variant
    (``srp_ann_topk``).  Candidate work is bounded by
    n_probe/n_cells of the corpus per query."""
    assigned, cents = ivf_assign(emb, n_cells, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    q_cells = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "cell",
        (_dot(F.col("qv"), F.col("cv"))
         / (_norm(F.col("qv")) * F.col("cn"))).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cell").asc())
    probes = (
        q_cells.withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= n_probe).select("query_id", "qv", "cell")
    )
    cand = assigned.join(F.broadcast(probes), "cell").where(
        F.col("vec_id") != F.col("query_id"))
    sim = F.round(
        _dot(F.col("v"), F.col("qv"))
        / (_norm(F.col("v")) * _norm(F.col("qv"))), 6)
    wr = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        cand.select("query_id",
                    F.col("vec_id").alias("neighbor_id"),
                    sim.alias("sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= k)
    )
