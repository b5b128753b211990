"""Graph analytics over pair graphs (the LSH candidate graph, entity
co-mention graphs, or any (a, b) edge table): degree statistics and
fixed-iteration PageRank.

These sit next to the connected-components operators in ``dedup.py``
as the iterative-analytics family: CC labels duplicate clusters,
degrees profile the graph (hub documents = template spam), PageRank
ranks centrality (which near-duplicate is the "canonical" one by
connectivity).

Scale shape: edges shuffle once per PageRank round keyed by node
(map-side-combined sum of contributions); ranks localCheckpoint per
round (lineage truncation — same requirement as ``dup_clusters``);
out-degrees are computed once and reused every round.  Fixed
iteration count (not convergence-driven) keeps the operator
deterministic AND exactly SQL-mirrorable: the oracle unrolls the same
K rounds as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sym_edges(pairs: DataFrame) -> DataFrame:
    return pairs.select(F.col("doc_a").alias("u"),
                        F.col("doc_b").alias("v")).union(
        pairs.select(F.col("doc_b").alias("u"),
                     F.col("doc_a").alias("v"))).distinct()


def degree_stats(pairs: DataFrame) -> DataFrame:
    """Degree distribution of the undirected pair graph:
    (degree, n_nodes) — the profile pass that flags template-spam
    hubs before clustering.  Two map-side-combined aggregations."""
    deg = _sym_edges(pairs).groupBy("u").agg(
        F.count("*").cast("long").alias("degree"))
    return deg.groupBy("degree").agg(
        F.count("*").cast("long").alias("n_nodes"))


def pagerank(
    pairs: DataFrame, n_iter: int = 5, damping: float = 0.85,
) -> DataFrame:
    """PageRank on the symmetrized pair graph, exactly ``n_iter``
    power-iteration rounds from a uniform start — (doc_id, rank)
    rounded to 6 dp.  Nodes are those appearing in ≥1 pair (every
    node then has out-degree ≥ 1: no dangling-mass term needed).

    rank_{k+1}(v) = (1-d)/n + d * Σ_{u→v} rank_k(u) / outdeg(u)
    """
    edges = _sym_edges(pairs).localCheckpoint()
    nodes = edges.select("u").distinct()
    n = nodes.count()
    outdeg = edges.groupBy("u").agg(
        F.count("*").alias("od")).localCheckpoint()
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks, "u")
            .join(outdeg, "u")
            .select(F.col("v").alias("u"),
                    (F.col("r") / F.col("od")).alias("c"))
            .groupBy("u")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "u", "left")
            .select("u",
                    (F.lit((1.0 - damping) / n)
                     + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0)))
                    .alias("r"))
            .localCheckpoint()
        )
    return ranks.select(F.col("u").alias("doc_id"),
                        F.round("r", 6).alias("rank"))
