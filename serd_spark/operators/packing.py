"""Sequence packing for training-data pipelines: the concat-and-chunk
plan (concatenate all documents' tokens in a deterministic order, cut
at context-window boundaries, let documents straddle cuts — the
standard pretraining packing scheme, cf. the GPT/T5 data pipelines).

The core primitive is a GLOBAL prefix sum over a deterministic
ordering.  A naive window (``Window.orderBy(...)`` with no partition
key) collapses to a single task at scale; this implementation uses
the classic two-pass distributed prefix sum instead:

1. range-partition by the order key; within each partition (rows are
   contiguous key ranges) a local running sum — parallel, one pass;
2. per-partition totals (a tiny aggregate, one row per partition) are
   offset-summed on the driver and broadcast back; the global cumsum
   is ``local_cum + offset[partition]``.

The result is identical to the single-window formulation (the oracle
uses plain ``SUM() OVER (ORDER BY ...)``) but every stage is
parallel, so it survives a 1000-executor corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_cumsum(
    df: DataFrame, value_col: str, order_col: str,
    n_partitions: int | None = None, out: str = "cum",
) -> DataFrame:
    """Exact global running sum of ``value_col`` in ``order_col``
    order (inclusive of the current row), distributed via the two-pass
    partition-offset scheme above."""
    n_parts = n_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    d = df.repartitionByRange(int(n_parts), F.col(order_col)) \
        .withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # localCheckpoint: the local-cumsum table feeds BOTH the offset
    # aggregate and the final join; without materialization a
    # recompute could re-draw repartitionByRange's sampled boundaries
    # and mismatch the offsets.  (order_col must be unique — ties make
    # the within-partition running order nondeterministic.)
    local = d.withColumn("_lcum", F.sum(value_col).over(w)) \
        .localCheckpoint()
    # one row per partition: cheap driver-side offset fold.  The
    # partition total is SUM(value_col), not max of the running sum —
    # those agree only for non-negative values, and this is advertised
    # as a general exact running sum (deltas can be negative).
    totals = sorted(
        local.groupBy("_pid").agg(
            F.sum(value_col).alias("t")).collect(),
        key=lambda r: r._pid)
    offsets, acc = {}, 0
    for r in totals:
        offsets[r._pid] = acc
        acc += r.t or 0
    spark = df.sparkSession
    off_tbl = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "_pid int, _off long")
    return (
        local.join(F.broadcast(off_tbl), "_pid")
        .withColumn(out, (F.col("_lcum") + F.col("_off")).cast("long"))
        .drop("_pid", "_lcum", "_off")
    )


def ffd_pack(
    docs: DataFrame, ctx_len: int = 2048, text_col: str = "text",
    n_shards: int = 64,
) -> DataFrame:
    """First-fit-decreasing bin packing WITHOUT document splitting:
    whole documents are grouped into ``ctx_len``-token sequences,
    minimizing padding waste — the packing scheme for instruction/
    SFT-style data where a training example must not straddle
    context windows (the complement of :func:`concat_chunk_plan`,
    which splits).  Documents longer than ``ctx_len`` get a solo
    overflow bin, flagged for truncation downstream.

    Output: (doc_id, n_tok, shard, bin_idx, overflow) — every input
    doc exactly once; the pack is (shard, bin_idx).

    Scale shape: FFD is inherently sequential, so the corpus is
    salted into ``n_shards`` deterministic shards by doc_id hash
    (NOT by physical partition — results must not depend on input
    partitioning) and FFD runs independently per shard in an
    Arrow-batched ``applyInPandas`` over (len desc, doc_id) order.
    Per-shard FFD is how production packers actually run — the
    classic FFD guarantee (≤ 11/9·OPT + 1 bins) holds within each
    shard, and shards are embarrassingly parallel.  The greedy loop
    is not SQL-expressible, so this operator is property-gated
    (exactly-once, capacity, FFD bound, repartition-invariance) in
    pytest rather than oracle-paired."""
    import pandas as pd

    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long").alias("n_tok"),
    ).withColumn(
        "shard",
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("long") % n_shards).cast("int"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tok", "doc_id"], ascending=[False, True])
        bins: list = []          # remaining capacity per bin
        out_bin, out_over = [], []
        for n in pdf["n_tok"]:
            if n >= ctx_len:
                out_bin.append(len(bins))
                out_over.append(n > ctx_len)
                bins.append(0)   # solo bin, full (or overflowing)
                continue
            for i, cap in enumerate(bins):
                if cap >= n:
                    bins[i] = cap - n
                    out_bin.append(i)
                    break
            else:
                out_bin.append(len(bins))
                bins.append(ctx_len - n)
            out_over.append(False)
        pdf = pdf.assign(bin_idx=out_bin, overflow=out_over)
        return pdf[["doc_id", "n_tok", "shard", "bin_idx", "overflow"]]

    return toks.groupBy("shard").applyInPandas(
        pack, schema="doc_id long, n_tok long, shard int,"
                     " bin_idx long, overflow boolean")


def sliding_chunks(
    docs: DataFrame, chunk_tokens: int = 256, overlap: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking with overlap — the RAG /
    long-context preprocessing op: each document becomes windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens − overlap``,
    the last window keeping its full tail.  Unlike
    :func:`concat_chunk_plan` (which packs ACROSS documents), chunks
    never cross document boundaries.

    Output: (doc_id, chunk_idx, tok_start, n_tok, chunk_text) — one
    row per window; short docs yield exactly one window.

    Scale shape: one scan; windows come from a JVM ``sequence`` +
    ``posexplode`` over the per-doc window count and a ``slice`` of
    the token array — no Python, no shuffle, no window function;
    embarrassingly parallel per document.  Exact SQL mirror
    (range + list slicing)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
    ).withColumn("_n", F.size("_t")).where(F.col("_n") > 0)
    # number of windows: 1 + ceil(max(0, n - chunk) / step), as pure
    # integer arithmetic (engine-portable; no float ceil)
    extra = F.greatest(F.col("_n") - chunk_tokens, F.lit(0))
    n_win = (F.lit(1)
             + F.floor((extra + step - 1) / F.lit(step)).cast("int"))
    win = toks.select(
        "doc_id", "_t", "_n",
        F.posexplode(F.sequence(F.lit(0), n_win - 1))
        .alias("chunk_idx", "_w"),
    )
    start = F.col("_w") * step
    n_tok = F.least(F.lit(chunk_tokens), F.col("_n") - start)
    return win.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("tok_start"),
        n_tok.cast("long").alias("n_tok"),
        F.concat_ws(" ", F.slice("_t", start + 1, n_tok))
        .alias("chunk_text"),
    )


def concat_chunk_plan(
    docs: DataFrame, ctx_len: int = 2048, text_col: str = "text",
    order_col: str = "doc_id",
) -> DataFrame:
    """Packing plan: for each document (in ``order_col`` order), where
    its tokens land in the concatenated token stream cut into
    ``ctx_len``-token chunks.  Documents may straddle chunk
    boundaries (they are split at training time — no padding waste).

    Output: (doc_id, n_tok, tok_start, chunk_first, chunk_last).
    ``tok_start`` = global offset of the doc's first token;
    ``chunk_first/chunk_last`` = ids of the context windows touched.
    """
    toks = docs.select(
        F.col(order_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long").alias("n_tok"),
    )
    c = global_cumsum(toks, "n_tok", order_col)
    start = F.col("cum") - F.col("n_tok")
    return c.select(
        F.col(order_col).cast("long").alias("doc_id"),
        "n_tok",
        start.cast("long").alias("tok_start"),
        F.floor(start / F.lit(ctx_len)).cast("long").alias("chunk_first"),
        F.floor((F.col("cum") - 1) / F.lit(ctx_len)).cast("long")
        .alias("chunk_last"),
    )
