"""Capture ``explain("formatted")`` for a set of queries to plans/<tag>/.

Usage:  PYTHONPATH=. python tools/capture_plans.py <tag> <suffix> [name ...]

Writes ``plans/<tag>/<query>_<suffix>.txt`` for each named query (default:
the bench.py headline + LLM + TPCH sections).  Plan-only — nothing is
executed, so it is safe to run alongside other work.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from bench import HEADLINE, LLM_SECTION, TPCH_SECTION
from weather_etl_spark.registry import load_all
from weather_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or (HEADLINE + LLM_SECTION + TPCH_SECTION)
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    specs = load_all()
    for name in names:
        try:
            df = specs[name].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"{name}: {len(plan)} chars", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
