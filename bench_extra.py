#!/usr/bin/env python
"""Per-query measurement harness for the optimization round (guide
§1): times individual declared queries with the SAME methodology as
bench.py (``.count()``, repeated, per-query min), captures
``.explain("formatted")`` into plans/r09/, and (optionally) dumps
stage-level task metrics from the UI REST API so serial stages
(1-task scans) are visible.

Not part of the frozen measurement contract — bench.py is the
driver's clock; this exists for §1.4-style isolation during the
round.  Usage:

    python bench_extra.py q1 q2 ...            # time queries
    python bench_extra.py --explain q1 ...     # also write plans
    python bench_extra.py --stages q1          # also dump stage info
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPEATS", "2"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r09")


def _mk_spark(ui: bool):
    from serd_spark.session import get_spark

    extra = {"spark.ui.enabled": "true"} if ui else None
    s = get_spark(f"serd_spark-extra-{CPUS}", master=f"local[{CPUS}]",
                  shuffle_partitions=64, extra_conf=extra)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _warm(spark):
    from pyspark.sql import functions as F

    def _f(s):
        return s

    w = F.pandas_udf(_f, "long")
    spark.range(100000).select(w("id").alias("x")) \
        .agg(F.sum("x")).collect()


def _stage_dump(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    out = []
    for st in stages:
        out.append({
            "stageId": st["stageId"],
            "name": st["name"][:60],
            "numTasks": st["numTasks"],
            "executorRunTime_s": round(st["executorRunTime"] / 1000, 1),
            "input_mb": round(st.get("inputBytes", 0) / 2**20, 1),
            "shuffleRead_mb": round(
                st.get("shuffleReadBytes", 0) / 2**20, 1),
            "shuffleWrite_mb": round(
                st.get("shuffleWriteBytes", 0) / 2**20, 1),
        })
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv
    do_stages = "--stages" in sys.argv
    suffix = "after"
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]

    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.retired_queries()}
    names = args or sorted(qs)
    spark = _mk_spark(ui=do_stages)
    try:
        _warm(spark)
        results = {}
        for name in names:
            if name not in qs:
                print(f"!! unknown query {name}", file=sys.stderr)
                continue
            if do_explain:
                os.makedirs(PLAN_DIR, exist_ok=True)
                df = qs[name](spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(
                        PLAN_DIR, f"{name}_{suffix}.txt"), "w") as f:
                    f.write(plan)
            best = float("inf")
            n_rows = None
            for _ in range(REPEATS):
                spark.sparkContext.setJobDescription(f"extra:{name}")
                t0 = time.time()
                n_rows = qs[name](spark, SF_DIR).count()
                best = min(best, time.time() - t0)
            results[name] = round(best, 3)
            print(f"{name}: {best:.3f}s  rows={n_rows}", flush=True)
        print(json.dumps({"sf_dir": SF_DIR, "queries": results}))
        if do_stages:
            for st in _stage_dump(spark):
                print(json.dumps(st))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
