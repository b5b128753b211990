"""End-to-end KG-construction pipeline (the serdi analogue, O-5).

transcripts → [assemble+scan chunks] → parse → quarantine split →
dedup/canonicalize → sorted NQuads materialization, with per-stage
checkpoints, per-conversation lineage metrics, and per-partition
counts — resumable: a re-run skips stages whose _DONE marker exists.

Run via spark-submit:
    spark-submit --py-files serd_spark.zip -m serd_spark.pipeline \
        --input /path/transcripts --output /path/kg --syntax turtle

Scale design (10^12 turns): transcripts are salted-hash partitioned by
conv_id (the groupBy shuffle hashes conv_id); mega-conversations split
into bounded chunks whose Env state is folded via a tiny broadcast
patch table (operators/parse.py); blank ids and stmt indices are pure
functions of input coordinates so retries/speculative tasks are safe;
the only wide operations are the chunk groupBy, the dedup, and the
final range-partition sort.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.canonicalize import (
    conv_metrics,
    dedup_triples,
    partition_metrics,
)
from .operators.materialize import (
    checkpoint_exists,
    read_checkpoint,
    write_checkpoint,
    write_sorted_nquads,
)
from .operators.parse import (
    assemble_chunks,
    parse_documents,
    parse_documents_chunked,
    parse_ntriples_lines,
    split_quarantine,
)


class KGPipeline:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        syntax: str = "turtle",
        lax: bool = True,
        chunk_turns: int = 64,
        chunked: bool = True,
        dedup: bool = True,
        fmt: str = "parquet",
    ):
        self.spark = spark
        self.workdir = workdir
        self.syntax = syntax
        self.lax = lax
        self.chunk_turns = chunk_turns
        self.chunked = chunked
        self.dedup = dedup
        self.fmt = fmt
        self.stage_infos: list[dict] = []

    def _path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _stage(self, name: str, build, partition_by=None) -> DataFrame:
        """Run or resume one checkpointed stage."""
        path = self._path(name)
        if checkpoint_exists(path):
            info = {"stage": name, "resumed": True}
            self.stage_infos.append(info)
            return read_checkpoint(self.spark, path, self.fmt)
        df = build()
        info = write_checkpoint(df, path, name, fmt=self.fmt,
                                partition_by=partition_by)
        self.stage_infos.append(info)
        return read_checkpoint(self.spark, path, self.fmt)

    def run(self, transcripts: DataFrame) -> dict:
        t0 = time.time()

        if self.syntax in ("ntriples", "nquads"):
            parsed = self._stage(
                "parsed",
                lambda: parse_ntriples_lines(
                    transcripts, nquads=(self.syntax == "nquads"),
                    lax=self.lax),
            )
        elif self.chunked:
            chunks = self._stage(
                "chunks",
                lambda: assemble_chunks(
                    transcripts, self.chunk_turns, self.syntax),
            )
            parsed = self._stage(
                "parsed",
                lambda: parse_documents_chunked(
                    transcripts, self.chunk_turns, self.syntax, self.lax,
                    chunks=chunks),
            )
        else:
            parsed = self._stage(
                "parsed",
                lambda: parse_documents(transcripts, self.syntax, self.lax),
            )

        triples, errors = split_quarantine(parsed)
        errors = self._stage("errors", lambda: errors)

        if self.dedup:
            triples = self._stage("triples", lambda: dedup_triples(triples))
        else:
            triples = self._stage("triples", lambda: triples)

        metrics_df = self._stage(
            "metrics", lambda: conv_metrics(triples, errors))
        pmetrics = partition_metrics(triples).collect()

        out_path = self._path("nquads")
        write_sorted_nquads(triples, out_path, fmt=self.fmt)

        n_triples = triples.count()
        n_errors = errors.count()
        summary = {
            "elapsed_sec": round(time.time() - t0, 3),
            "n_triples": n_triples,
            "n_errors": n_errors,
            "n_convs": metrics_df.count(),
            "partitions": sorted(
                (r.partition_id, r.n_rows) for r in pmetrics),
            "stages": self.stage_infos,
            "output": out_path,
        }
        with open(os.path.join(self.workdir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2, default=str)
        return summary


def main() -> None:
    from .session import get_spark
    from .transcripts import transcripts_df

    ap = argparse.ArgumentParser(description="serd_spark KG pipeline")
    ap.add_argument("--input", help="transcripts parquet (F1 schema); "
                    "omit to use the synthetic generator")
    ap.add_argument("--n-convs", type=int, default=1000)
    ap.add_argument("--output", required=True, help="work/output dir")
    ap.add_argument("--syntax", default="turtle",
                    choices=["turtle", "trig", "ntriples", "nquads"])
    ap.add_argument("--strict", action="store_true")
    ap.add_argument("--chunk-turns", type=int, default=64)
    ap.add_argument("--no-chunking", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("serd_spark.pipeline", master=args.master)
    if args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        transcripts = transcripts_df(spark, args.n_convs)
    pipe = KGPipeline(
        spark, args.output, syntax=args.syntax, lax=not args.strict,
        chunk_turns=args.chunk_turns, chunked=not args.no_chunking,
    )
    summary = pipe.run(transcripts)
    print(json.dumps({k: v for k, v in summary.items() if k != "stages"}))


if __name__ == "__main__":
    main()
