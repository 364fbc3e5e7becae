"""Statistical aggregates II + corpus capping (SURVEY.md §2 B.12,
round 6 second batch): per-domain document caps, a correlation matrix,
and weighted medians.

Each re-expresses a computation the reference's downstream consumers
(lambda_function.py:151-175 lands frames for BI/analysis) run on the
landed data, as one exact-oracled declarative plan:

- q_llm_domain_cap: cap documents per source domain at k by quality —
  the anti-domain-dominance gate every crawl mix applies;
- q_agg_corr_matrix: pairwise Pearson correlations of the lineitem
  measures per return flag — the one-pass multi-metric profile;
- q_agg_weighted_median: quantity-weighted median price via the
  cumulative-weight crossing rule, deterministic under ties through
  a RANGE (peers-inclusive) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_etl_spark.io import read_table
from weather_etl_spark.registry import register

#: Documents retained per source domain by the cap.
_DOMAIN_CAP_K = 5


@register(
    "q_llm_domain_cap",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, n_chars, rk
FROM ranked WHERE rk <= {_DOMAIN_CAP_K}
""",
    doc=f"Per-domain document cap: keep the top {_DOMAIN_CAP_K} "
    "documents of each source domain by quality proxy (length desc, "
    "doc_id tie-break) — the standard anti-dominance gate that stops "
    "one crawl domain from swamping the pretraining mix. Pure "
    "rank-filter, so the retained set is deterministic and "
    "re-derivable.",
    scale_notes="rank<=k compiles to WindowGroupLimit: each input "
    "partition keeps a k-row heap per domain BEFORE the domain "
    "shuffle, so the exchange carries at most k x partitions rows "
    "per domain, not the corpus. Plan-asserted; same shape as "
    "q_topk_group.",
)
def q_llm_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.select(
            "doc_id", "source", "n_chars", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") <= _DOMAIN_CAP_K)
    )


@register(
    "q_agg_corr_matrix",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       ROUND(corr(l_quantity, l_discount), 4) + 0.0 AS corr_qty_disc,
       ROUND(corr(l_extendedprice, l_tax), 4) + 0.0 AS corr_price_tax,
       ROUND(corr(l_discount, l_tax), 4) + 0.0 AS corr_disc_tax
FROM lineitem GROUP BY l_returnflag
""",
    doc="Pairwise Pearson correlation matrix of the lineitem "
    "measures (quantity/price/discount/tax) per return flag — the "
    "multi-metric statistical profile computed in ONE grouped pass: "
    "every corr() is an algebraic aggregate (sums of x, y, xy, x2, "
    "y2), so all four pairs share the same shuffle.",
    scale_notes="One map-side-combined exchange on the 3-value flag; "
    "each partial state is 6 doubles per pair. Correlation over "
    "billions of rows is exactly this shape on any engine — the "
    "whole matrix costs one pass regardless of pair count.",
)
def q_agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    zero = F.lit(0.0)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        (F.round(F.corr("l_quantity", "l_discount"), 4) + zero).alias(
            "corr_qty_disc"
        ),
        (F.round(F.corr("l_extendedprice", "l_tax"), 4) + zero).alias(
            "corr_price_tax"
        ),
        (F.round(F.corr("l_discount", "l_tax"), 4) + zero).alias(
            "corr_disc_tax"
        ),
    )


@register(
    "q_agg_weighted_median",
    oracle="""
WITH cum AS (
  SELECT l_returnflag, l_extendedprice, l_quantity,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag
           ORDER BY l_extendedprice
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
       ROUND(MIN(l_extendedprice), 4) AS weighted_median_price,
       ROUND(MAX(tw), 4) AS total_weight
FROM cum WHERE 2 * cw >= tw
GROUP BY l_returnflag
""",
    doc="Quantity-weighted median of the extended price per return "
    "flag: the smallest price whose inclusive cumulative weight "
    "reaches half the group's total — the weighted generalization "
    "of q_agg_median. The RANGE frame makes the cumulative weight "
    "peers-inclusive, so equal prices share one cumulative value "
    "and the crossing price is deterministic under any tie order.",
    scale_notes="One l_returnflag shuffle + per-partition sort (the "
    "window) and a trivial re-aggregate. At 100 TB with few groups, "
    "salt the sort into price-range buckets and pick the crossing "
    "bucket from the bounded bucket ledger — the q_llm_token_budget "
    "bin decomposition applies verbatim to any weighted quantile.",
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(w_cum).alias("cw"),
        F.sum("l_quantity").over(w_tot).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 4).alias(
                "weighted_median_price"
            ),
            F.round(F.max("tw"), 4).alias("total_weight"),
        )
    )
