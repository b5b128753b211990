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
from functools import lru_cache

import pandas as pd
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


@lru_cache(maxsize=8)
def _np_planes(n_tables: int, n_planes: int, dim: int):
    """All tables' hyperplanes stacked as one (n_tables*n_planes, dim)
    float64 matrix (same blake2 derivation, cached per executor)."""
    import numpy as np

    return np.array(
        [row for t in range(n_tables)
         for row in _hyperplanes(t, n_planes, dim)],
        dtype=np.float64)


def srp_lsh_buckets(
    emb: DataFrame, n_planes: int = 5, n_tables: int = 6,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table SRP LSH: for each of L independent tables, bucket =
    sign bits against that table's hyperplanes.  One output row per
    (vector, table) — the classic L-tables recall/cost dial.

    Signatures are one vectorized pandas UDF: a single numpy
    ``sign(X @ P.T)`` per Arrow batch computes all tables at once.
    (Earlier literal-array-expression form blew up the Catalyst plan
    at real dims — n_tables x n_planes x dim literals at dim 768-4096
    — and needed a driver-side ``.first()`` dim probe; the UDF takes
    the dim from the batch itself.)
    """
    import numpy as np

    @F.pandas_udf("array<long>")
    def sig(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        X = np.array(vs.tolist(), dtype=np.float64)        # (n, dim)
        P = _np_planes(n_tables, n_planes, X.shape[1])     # (T*P, dim)
        bits = (X @ P.T) >= 0.0                            # (n, T*P)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        buckets = bits.reshape(len(X), n_tables, n_planes) @ weights
        return pd.Series(list(buckets))

    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.posexplode(sig(F.col(vec_col))).alias("tbl", "bucket"),
    ).withColumn("tbl", F.col("tbl").cast("int"))


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
    n_blocks: int = 16, margin: float = 1e-4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, sim) with
    sim ≥ tau, a < b (the dedup-by-embedding variant).  Exact.

    Two stages:

    1. **Blocked-GEMM candidates.**  Vectors are hashed into
       ``n_blocks`` blocks; each of the B(B+1)/2 block *pairs* is one
       cogrouped task that finds sim ≥ tau - margin pairs with a
       single numpy matmul.  No crossJoin over the full table, no
       un-broadcastable build side: shuffle volume is n·B rows and
       per-task memory is two blocks.  The O(n²) *flops* are inherent
       to an exact threshold join, but they run as vectorized GEMM
       (~100x the per-pair HOF-expression path), and ``margin`` makes
       the stage a strict superset of the answer (numpy-vs-JVM float
       divergence is ~1e-13, four orders below the 1e-4 margin).

    2. **Exact JVM verify.**  Candidates (a tiny near-threshold pair
       set) join back to the vectors and the final sim is the same
       ``aggregate``/``zip_with`` dot + round(…,6) float path as the
       SQL oracle — every *emitted* value is bit-identical to the
       all-pairs formulation.

    Why not SRP-LSH candidate staging (as MinHash→Jaccard in
    ``operators/dedup.py``)?  Measured on this corpus: at tau = 0.45
    (angle ≈ 63°, near-random sign agreement p ≈ 0.65) any SRP
    configuration with full recall of the threshold pairs generates
    ≥ 98-100% of all pairs as candidates — banding only bounds work
    for high-sim regimes (tau ≥ ~0.7), where ``srp_lsh_buckets`` is
    the right stage-1.  For exact low-tau joins, blocked GEMM is the
    scale path up to ~10M vectors; beyond that, exact all-pairs is
    infeasible for any engine and the ANN paths apply.
    """
    import numpy as np

    id_dt = dict(zip(emb.schema.names,
                     (f.dataType.simpleString() for f in emb.schema)))
    cand_schema = f"vec_a {id_dt[id_col]}, vec_b {id_dt[id_col]}"

    base = emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).cast("array<double>").alias("v"))

    spark = emb.sparkSession
    pair_rows = [(i, j) for i in range(n_blocks)
                 for j in range(i, n_blocks)]

    def side(key_col: str) -> DataFrame:
        # fresh pair table + aliased fact side per call: keeps the two
        # block-pair joins free of self-join attribute ambiguity
        bp = F.broadcast(spark.createDataFrame(pair_rows, "bi int, bj int"))
        tagged = base.withColumn(
            "blk",
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_blocks)).cast("int"))
        # re-alias: fresh attribute ids per side (cogroup of two
        # branches of the same lineage trips the self-join check)
        return tagged.join(bp, F.col("blk") == F.col(key_col)).select(
            "bi", "bj", F.col("vec_id").alias("vec_id"),
            F.col("v").alias("v"))

    lhs, rhs = side("bi"), side("bj")
    thresh = tau - margin

    def find_pairs(key, left: pd.DataFrame, right: pd.DataFrame
                   ) -> pd.DataFrame:
        bi, bj = key
        empty = pd.DataFrame({"vec_a": [], "vec_b": []})
        if bi == bj:
            if len(left) < 2:
                return empty
            ids = left["vec_id"].values
            X = np.array(left["v"].tolist(), dtype=np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            ii, jj = np.nonzero(np.triu(Xn @ Xn.T >= thresh, 1))
            va, vb = ids[ii], ids[jj]
        else:
            if not len(left) or not len(right):
                return empty
            lids, rids = left["vec_id"].values, right["vec_id"].values
            Xl = np.array(left["v"].tolist(), dtype=np.float64)
            Xr = np.array(right["v"].tolist(), dtype=np.float64)
            Xl /= np.linalg.norm(Xl, axis=1, keepdims=True)
            Xr /= np.linalg.norm(Xr, axis=1, keepdims=True)
            ii, jj = np.nonzero(Xl @ Xr.T >= thresh)
            va, vb = lids[ii], rids[jj]
        lo = np.where(va < vb, va, vb)
        hi = np.where(va < vb, vb, va)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi})

    cand = (
        lhs.groupBy("bi", "bj")
        .cogroup(rhs.groupBy("bi", "bj"))
        .applyInPandas(find_pairs, schema=cand_schema)
    )

    # Verify: identical float path to the all-pairs oracle.  Norms
    # once per VECTOR; division at the end; round(…,6).
    a = base.select(F.col("vec_id").alias("vec_a"),
                    F.col("v").alias("va")) \
            .withColumn("na", _norm(F.col("va")))
    b = base.select(F.col("vec_id").alias("vec_b"),
                    F.col("v").alias("vb")) \
            .withColumn("nb", _norm(F.col("vb")))
    sim = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        cand.join(a, "vec_a").join(b, "vec_b")
        .select("vec_a", "vec_b", sim.alias("sim"))
        .where(F.col("sim") >= tau)
    )


def embedding_decontamination(
    emb: DataFrame, eval_emb: DataFrame, tau: float = 0.8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    margin: float = 1e-4,
) -> DataFrame:
    """Semantic benchmark decontamination: (vec_id, eval_id, sim) for
    every corpus vector whose cosine to ANY eval/benchmark vector is
    ≥ tau — the embedding-space complement of the n-gram
    ``dedup.contamination_flags`` (catches paraphrased eval leakage
    that shingle overlap misses).

    Scale shape: the eval matrix is benchmark-sized (thousands of
    vectors), normalized once and shipped via
    ``SparkContext.broadcast``; the corpus is scanned ONCE by an
    Arrow-batched GEMM (one numpy matmul per batch) emitting only
    near-threshold candidates (sim ≥ tau − margin); the tiny candidate
    set then broadcast-joins back for the exact JVM
    ``aggregate``/``zip_with`` dot + round(…,6), so every emitted sim
    is bit-identical to the all-pairs SQL oracle — the same two-stage
    candidates-then-verify trick as :func:`embedding_neardup`.  The
    corpus never shuffles and there is no cartesian anywhere."""
    import numpy as np

    base = emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    ev_rows = sorted(
        eval_emb.select(F.col(id_col).alias("vec_id"),
                        F.col(vec_col).cast("array<double>").alias("v"))
        .collect(), key=lambda r: r.vec_id)
    ev_rows = [r for r in ev_rows
               if r.v is not None and any(x != 0.0 for x in r.v)]
    E = (np.array([r.v for r in ev_rows], dtype=np.float64)
         if ev_rows else np.zeros((0, 1)))
    En = E / np.linalg.norm(E, axis=1, keepdims=True) if len(E) else E
    eids = np.array([r.vec_id for r in ev_rows], dtype=np.int64)
    bc = emb.sparkSession.sparkContext.broadcast((En, eids))
    thresh = tau - margin

    dim = int(En.shape[1]) if len(En) else 0

    def find(batches):
        En_, eids_ = bc.value
        for pdf in batches:
            if not len(pdf) or not len(En_):
                continue
            # Same null/zero-norm guard as ivf_assign: null embeddings
            # become zero vectors and zero-norm rows are masked out of
            # the threshold (cosine undefined → no candidates, rather
            # than a np.array crash on None or NaN rows that silently
            # pass/fail the >= comparison differently per engine).
            X = np.array(
                [v if v is not None else [0.0] * dim
                 for v in pdf["v"].tolist()], dtype=np.float64)
            xn = np.linalg.norm(X, axis=1)
            Xn = X / np.where(xn == 0, 1.0, xn)[:, None]
            sims = Xn @ En_.T
            sims[xn == 0, :] = -np.inf
            ii, jj = np.nonzero(sims >= thresh)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].values[ii],
                "eval_id": eids_[jj],
            })

    cand = F.broadcast(
        base.mapInPandas(find, schema="vec_id long, eval_id long"))
    a = base.select("vec_id", F.col("v").alias("va")) \
        .withColumn("na", _norm(F.col("va")))
    b = eval_emb.select(
        F.col(id_col).alias("eval_id"),
        F.col(vec_col).cast("array<double>").alias("vb")) \
        .withColumn("nb", _norm(F.col("vb")))
    sim = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        cand.join(a, "vec_id").join(F.broadcast(b), "eval_id")
        .select(F.col("vec_id").cast("long").alias("vec_id"),
                F.col("eval_id").cast("long").alias("eval_id"),
                sim.alias("sim"))
        .where(F.col("sim") >= tau)
    )


def ivf_assign(
    emb: DataFrame, n_cells: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    vectorized: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: centroids are a deterministic sample of
    the corpus (lowest md5(vec_id) — stable under partitioning and
    retries, no iterative k-means needed for a coarse partitioner);
    every vector is assigned to its max-cosine centroid.

    Returns (assigned, centroids): ``assigned`` = emb + ``cell``
    column; the inverted file is the implicit (cell → vectors)
    grouping.  At 100 TB ``assigned`` is written bucketed by ``cell``
    so probes prune partitions.

    ``vectorized=True`` swaps the JVM expression assignment (a
    corpus × centroids broadcast cross join of per-element HOF dots —
    exact but ~100× slower at real dims) for one numpy GEMM per Arrow
    batch with the centroid matrix riding the UDF closure — the same
    trade the blocked-GEMM near-dup stage makes.  Assignment ties at
    float equality may fall differently between the two paths
    (argmax-first vs window tie-break both pick the smallest cell, but
    JVM/numpy float sums can differ in the last ulp); downstream
    recall gates tolerate this, which is why the default stays JVM for
    the oracle-facing contract query."""
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
    if vectorized:
        import numpy as np

        cent_rows = sorted(cents.collect(), key=lambda r: r.cell)
        C = np.array([r.cv for r in cent_rows], dtype=np.float64)
        cn = np.linalg.norm(C, axis=1)
        cell_ids = np.array([r.cell for r in cent_rows], dtype=np.int64)

        dim = C.shape[1]
        cn_safe = np.where(cn == 0, 1.0, cn)

        @F.pandas_udf("long")
        def assign(vs: pd.Series) -> pd.Series:
            if not len(vs):
                return pd.Series([], dtype="int64")
            # null embeddings become zero vectors (handled below)
            X = np.array(
                [v if v is not None else [0.0] * dim for v in vs],
                dtype=np.float64)
            xn = np.linalg.norm(X, axis=1)
            sims = (X @ C.T) / (
                np.where(xn == 0, 1.0, xn)[:, None] * cn_safe[None, :])
            # argmax returns the FIRST max — rows sorted by cell, so
            # ties break to the smallest cell like the window path.
            # Zero-norm/null rows have all-zero sims, so they fall
            # deterministically to the smallest cell instead of
            # propagating NaN through argmax.
            return pd.Series(cell_ids[np.argmax(sims, axis=1)])

        return v.withColumn("cell", assign(F.col("v"))), cents
    scored = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "cell",
        (_dot(F.col("v"), F.col("cv"))
         / (_norm(F.col("v")) * F.col("cn"))).alias("csim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cell").asc())
    assigned = (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= 1).drop("_r", "csim")
    )
    return assigned, cents


def ivf_ann_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10, n_cells: int = 16,
    n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
    vectorized: bool = False,
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``n_probe``
    nearest cells and ranks exact cosine only within them — the
    classic inverted-file ANN next to the SRP-LSH variant
    (``srp_ann_topk``).  Candidate work is bounded by
    n_probe/n_cells of the corpus per query.  ``vectorized`` selects
    the GEMM assignment path (see :func:`ivf_assign`)."""
    assigned, cents = ivf_assign(emb, n_cells, id_col, vec_col,
                                 vectorized=vectorized)
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


def embedding_quantize(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 embedding quantization: per-vector scale =
    max|x|, component q_i = floor(x_i · 127 / scale) — the 4×
    compression that makes 100 TB-scale ANN indexes (int8 IVF/HNSW)
    affordable, with reconstruction x̂_i = q_i · scale / 127 within
    one quantum (property-tested).

    Output: (vec_id, scale, qvec array<int>); zero/null vectors emit
    scale 0.0 / NULL with an all-zero / NULL qvec (no divide).

    Scale/exactness shape: one scan, pure element-wise JVM expressions
    (``transform``/``array_max``) — no shuffle, no Python.  FLOOR (not
    a decimal rounding) keeps the oracle exact: both engines compute
    the identical IEEE double ``x·127/scale`` (element-wise float
    pipelines are bit-identical, the ``ivf_cells`` proof), and floor
    of the same double is the same integer — no half-boundary to
    disagree on.  ``scale`` is emitted at the standard round(…,6)
    display grain; q uses the UNROUNDED scale."""
    v = F.col(vec_col).cast("array<double>")
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(
        mx > 0,
        F.transform(v, lambda x: F.floor(x * F.lit(127.0) / mx)
                    .cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.round(mx, 6).alias("scale"),
        q.alias("qvec"),
    )


def random_project(
    emb: DataFrame, out_dim: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    vectorized: bool = False,
) -> DataFrame:
    """Deterministic ±1 random projection (Achlioptas-style) — the
    dimensionality-reduction step that makes downstream ANN/clustering
    affordable at high input dims: proj_k = Σ_i v_i · sign(k, i) with
    sign(k, i) = ±1 from the parity of md5's first nibble over
    ``rp:{k}:{i}`` — a pure function of coordinates (no RNG state, so
    every executor/retry/engine agrees; same discipline as the SRP
    hyperplanes, but md5 so the SQL oracle can re-derive the matrix).

    Output: (vec_id, k, proj) rows, proj at 6 dp.

    Two paths, same trade as :func:`ivf_assign`: the default builds
    the plane vectors as a BROADCAST ``out_dim``-row table of arrays
    (never a literal expression tree — the SRP lesson: literal
    matrices blow up Catalyst at real dims) and computes the JVM
    left-to-right ``zip_with``/``aggregate`` dot, which is
    BIT-identical to DuckDB's ``list_dot_product`` — an exact-hash
    oracle with zero float drift.  ``vectorized=True`` swaps in one
    numpy GEMM per Arrow batch (the 100 TB path at dim ≥ 768); its
    sums are pairwise-ordered, so gate it with recall/tolerance
    checks, not exact hashes."""
    import hashlib

    spark = emb.sparkSession
    v = emb.select(F.col(id_col).cast("long").alias("vec_id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    probe = emb.where(F.col(vec_col).isNotNull()) \
        .select(vec_col).first()
    if probe is None:  # empty table / all-null column
        return spark.createDataFrame(
            [], "vec_id long, k long, proj double")
    dim = len(probe[0])

    def sign(k: int, i: int) -> float:
        h = hashlib.md5(f"rp:{k}:{i}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) % 2 else -1.0

    if vectorized:
        import numpy as np

        P = np.array([[sign(k, i) for i in range(dim)]
                      for k in range(out_dim)])

        @F.pandas_udf("array<double>")
        def proj(vs: pd.Series) -> pd.Series:
            if not len(vs):
                return pd.Series([], dtype=object)
            # null embeddings -> all-null projection arrays, matching
            # the JVM path's (vec_id, k, NULL) rows (ivf_assign-style
            # guard: never feed None into np.array)
            vals = vs.tolist()
            X = np.array([x if x is not None else [0.0] * dim
                          for x in vals], dtype=np.float64)
            Y = X @ P.T
            return pd.Series(
                [list(y) if x is not None else [None] * out_dim
                 for x, y in zip(vals, Y)])

        return v.select(
            "vec_id", F.posexplode(proj(F.col("v"))).alias("k", "p")
        ).select("vec_id", F.col("k").cast("long").alias("k"),
                 F.round("p", 6).alias("proj"))

    planes = spark.createDataFrame(
        [(k, [sign(k, i) for i in range(dim)])
         for k in range(out_dim)],
        "k long, sv array<double>")
    return (
        v.crossJoin(F.broadcast(planes))
        .select("vec_id", "k",
                F.round(_dot(F.col("v"), F.col("sv")), 6).alias("proj"))
    )
