"""ANN bucket-boundedness at corpus scale (VERDICT r2 item 7).

50k vectors at dim 768 (clustered: 200 centers + small noise — the
shape of real embedding corpora, where ANN recall is meaningful).
Asserts BOTH quality and cost:

- recall@10 >= 0.8 against a numpy brute-force ground truth;
- candidate fraction per query < 10% of the corpus — the empirical
  bucket-boundedness claim (a candidate generator that degenerates to
  most of the corpus is a disguised cross join).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

pytestmark = [pytest.mark.spark, pytest.mark.slow]

N, DIM, N_CENTERS, N_QUERIES, K = 50_000, 768, 200, 10, 10


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(0)
    centers = rng.normal(size=(N_CENTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, N_CENTERS, size=N)
    # noise with norm ~0.3 relative to the unit centers: same-cluster
    # cosine ~0.92, cross-cluster ~0 — the clustered regime real
    # embedding corpora live in.  (Per-coordinate sigma must be scaled
    # by 1/sqrt(DIM): unscaled N(0, 0.05) noise has norm 0.05*sqrt(768)
    # = 1.39 and swamps the centers entirely.)
    noise = rng.normal(scale=0.3 / np.sqrt(DIM), size=(N, DIM))
    X = centers[assign] + noise
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X = X.astype(np.float64)
    pdf = pd.DataFrame({"vec_id": np.arange(N, dtype=np.int64),
                        "embedding": list(X)})
    emb = spark.createDataFrame(pdf).persist()
    emb.count()
    return emb, X


def _exact_topk(X, q_ids, k):
    sims = X[q_ids] @ X.T                      # unit vectors: dot=cos
    want = {}
    for row, qi in enumerate(q_ids):
        s = sims[row].copy()
        s[qi] = -np.inf                        # exclude self
        top = np.argpartition(-s, k)[:k]
        want[qi] = set(top[np.argsort(-s[top])])
    return want


def test_srp_ann_recall_and_candidate_bound(spark, corpus):
    from serd_spark.operators.similarity import srp_ann_topk, srp_lsh_buckets

    emb, X = corpus
    n_planes, n_tables = 10, 6
    q_ids = list(range(N_QUERIES))
    queries = emb.where(F.col("vec_id") < N_QUERIES)

    ann = srp_ann_topk(emb, queries, k=K,
                       n_planes=n_planes, n_tables=n_tables)
    got = {}
    for r in ann.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    want = _exact_topk(X, q_ids, K)
    hits = sum(len(got.get(q, set()) & want[q]) for q in q_ids)
    recall = hits / (K * len(q_ids))
    assert recall >= 0.8, recall

    # candidate fraction: distinct (query, vec) sharing >=1 probed
    # bucket — mirror of the operator's join, counted
    b_emb = srp_lsh_buckets(emb, n_planes, n_tables)
    b_q = srp_lsh_buckets(queries, n_planes, n_tables).select(
        F.col("vec_id").alias("query_id"), "tbl",
        F.explode(F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i))
              for i in range(n_planes)])).alias("bucket"))
    n_cand = (
        b_emb.select("vec_id", "tbl", "bucket")
        .join(F.broadcast(b_q), ["tbl", "bucket"])
        .select("query_id", "vec_id").distinct().count()
    )
    frac = n_cand / (N * len(q_ids))
    assert frac < 0.10, frac


def test_ivf_ann_recall_and_candidate_bound(spark, corpus):
    from serd_spark.operators.similarity import ivf_ann_topk, ivf_assign

    emb, X = corpus
    n_cells, n_probe = 128, 8
    q_ids = list(range(N_QUERIES))
    queries = emb.where(F.col("vec_id") < N_QUERIES)

    # vectorized GEMM assignment: the JVM HOF path is exact-identical
    # in spirit but ~100x slower at 50k x 128 x dim-768 (this test
    # took ~20 min of its runtime in assignment alone without it)
    ann = ivf_ann_topk(emb, queries, k=K,
                       n_cells=n_cells, n_probe=n_probe,
                       vectorized=True)
    got = {}
    for r in ann.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    want = _exact_topk(X, q_ids, K)
    hits = sum(len(got.get(q, set()) & want[q]) for q in q_ids)
    recall = hits / (K * len(q_ids))
    assert recall >= 0.8, recall

    # candidate work per query = sum of the cells it actually probes
    # (mirror of the operator's probe join, counted per query)
    assigned, cents = ivf_assign(emb, n_cells, vectorized=True)
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").cast("array<double>")
                       .alias("qv"))
    from serd_spark.operators.similarity import _dot, _norm
    from pyspark.sql import Window

    q_cells = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "cell",
        (_dot(F.col("qv"), F.col("cv"))
         / (_norm(F.col("qv")) * F.col("cn"))).alias("csim"))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cell").asc())
    probes = q_cells.withColumn("_r", F.row_number().over(wq)) \
        .where(F.col("_r") <= n_probe).select("query_id", "cell")
    per_q = (
        assigned.join(F.broadcast(probes), "cell")
        .groupBy("query_id").agg(F.count("*").alias("n_cand"))
        .collect()
    )
    worst = max(r.n_cand for r in per_q)
    assert worst / N < 0.10, (worst, N)
