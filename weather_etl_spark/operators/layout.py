"""Data-layout operators (SURVEY.md §2 B.12, round 6 second batch):
Z-order clustering keys and small-file compaction planning — the two
table-maintenance computations a 100 TB parquet lake runs to keep
scans prunable and file counts sane.

The reference lands flat parquet (lambda_function.py:151-175 append
path); these operators compute the layout decisions a production lake
layers on top. Both are pure integer arithmetic, exact-oracled.

- q_layout_zorder: Morton (Z-order) interleaving of two join/filter
  dimensions into one clustering key, plus per-cluster bounding boxes
  — the statistic that proves multi-column data skipping works
  (each cluster's min/max box is tight, so a predicate on EITHER
  dimension prunes whole clusters);
- q_layout_compaction: next-fit file-group planning over per-partition
  byte totals — contiguous small files greedily grouped until the
  target size is crossed, the planning step of an OPTIMIZE/compaction
  job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_etl_spark.io import read_table
from weather_etl_spark.registry import register

#: Bits per dimension for the Morton key (10 -> 1024-cell axes) and
#: the cluster granularity (drop the low 8 interleaved bits -> 4096
#: clusters of 16x16 cells).
_Z_BITS = 10
_Z_CLUSTER_SHIFT = 8
_Z_DIM = 1 << _Z_BITS


def _morton_sql(px: str, sx: str, div: str) -> str:
    """Bit-interleave SQL over two {_Z_DIM}-range ints; identical
    arithmetic in both engines modulo the integer-division token
    (DuckDB ``//`` vs Spark ``DIV``)."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"(({px} {div} {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"(({sx} {div} {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


@register(
    "q_layout_zorder",
    oracle=f"""
WITH keyed AS (
  SELECT l_orderkey,
         l_partkey % {_Z_DIM} AS px,
         l_suppkey % {_Z_DIM} AS sx
  FROM lineitem
), z AS (
  SELECT l_orderkey, px, sx,
         ({_morton_sql("px", "sx", "//")}) AS zval
  FROM keyed
)
SELECT zval // {1 << _Z_CLUSTER_SHIFT} AS cluster_id,
       COUNT(*) AS n_rows,
       MIN(px) AS min_px, MAX(px) AS max_px,
       MIN(sx) AS min_sx, MAX(sx) AS max_sx,
       (MAX(px) - MIN(px) + 1) * (MAX(sx) - MIN(sx) + 1) AS bbox_area
FROM z GROUP BY cluster_id
""",
    doc="Z-order clustering audit: the Morton key bit-interleaves "
    f"two filter dimensions (l_partkey, l_suppkey mod {_Z_DIM}) so "
    "rows close in EITHER dimension land in the same cluster; "
    "emitted per cluster are the row count and the min/max bounding "
    "box of both dimensions — the exact statistics parquet row-group "
    "skipping consults, and the proof the boxes are tight "
    f"(16x16 cells = bbox_area <= 256 for full clusters, vs ~{_Z_DIM}"
    "-wide boxes under naive single-column sort).",
    scale_notes="The interleave is codegen'd constant-shift integer "
    "arithmetic (zero shuffle); the cluster aggregate is one "
    "map-side-combined exchange on the cluster id. At 100 TB this IS "
    "the OPTIMIZE ZORDER write path: repartitionByRange(zval) before "
    "the sink gives each output file a tight multi-dimension box, "
    "and the same aggregate verifies it.",
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        (F.col("l_partkey") % _Z_DIM).alias("px"),
        (F.col("l_suppkey") % _Z_DIM).alias("sx"),
    )
    z = keyed.withColumn("zval", F.expr(_morton_sql("px", "sx", "DIV")))
    return (
        z.withColumn(
            "cluster_id", F.expr(f"zval DIV {1 << _Z_CLUSTER_SHIFT}")
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("px").alias("min_px"),
            F.max("px").alias("max_px"),
            F.min("sx").alias("min_sx"),
            F.max("sx").alias("max_sx"),
        )
        .withColumn(
            "bbox_area",
            (F.col("max_px") - F.col("min_px") + 1)
            * (F.col("max_sx") - F.col("min_sx") + 1),
        )
    )


#: Target compacted file-group size, in the fixture's byte proxy
#: (sum of n_chars per partition directory).
_COMPACT_TARGET = 16384


@register(
    "q_layout_compaction",
    oracle=f"""
WITH files AS (
  SELECT source, lang, CAST(SUM(n_chars) AS BIGINT) AS bytes
  FROM documents GROUP BY source, lang
), planned AS (
  SELECT source, lang, bytes,
         CAST((COALESCE(SUM(bytes) OVER (ORDER BY source, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
              // {_COMPACT_TARGET} AS INT) AS bin
  FROM files
)
SELECT source, lang, bytes, bin,
       CAST(SUM(bytes) OVER (PARTITION BY bin) AS BIGINT) AS bin_bytes,
       COUNT(*) OVER (PARTITION BY bin) AS bin_files
FROM planned
""",
    doc="Small-file compaction planning (the OPTIMIZE bin-packing "
    "step): per-partition byte totals (source x lang directories, "
    "sized by their text payload) are walked in path order and "
    "greedily grouped next-fit — a file group closes once the "
    f"running total crosses {_COMPACT_TARGET} — emitting each "
    "file's assigned group plus group totals. Next-fit on a sorted "
    "walk is what real lake compactors run: it preserves partition "
    "locality and needs only a prefix sum, not global bin packing.",
    scale_notes="Operates on file METADATA (one row per file/"
    "partition), not data — at 100 TB that is millions of rows, "
    "kilobytes per row. The prefix sum over the path order is the "
    "same bounded-ledger shape as q_llm_token_budget; the grouped "
    "totals reuse the bin partitioning. The actual rewrite the plan "
    "drives is snk_partitioned's write path, one task per bin.",
)
def q_layout_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    files = docs.groupBy("source", "lang").agg(
        F.sum("n_chars").alias("bytes")
    )
    w_prefix = Window.orderBy("source", "lang").rowsBetween(
        Window.unboundedPreceding, -1
    )
    planned = (
        files.withColumn(
            "_prefix", F.coalesce(F.sum("bytes").over(w_prefix), F.lit(0))
        )
        .withColumn("bin", F.expr(f"_prefix DIV {_COMPACT_TARGET}").cast("int"))
        .drop("_prefix")
    )
    w_bin = Window.partitionBy("bin")
    return planned.select(
        "source",
        "lang",
        "bytes",
        "bin",
        F.sum("bytes").over(w_bin).alias("bin_bytes"),
        F.count(F.lit(1)).over(w_bin).alias("bin_files"),
    )


#: Epsilon for the spatial distance join over the first two embedding
#: dimensions (coordinates span ~[-0.4, 0.4]).
_SPATIAL_EPS = 0.02


@register(
    "q_join_spatial_grid",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(sqrt((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y)), 4) AS dist
FROM pts a JOIN pts b ON a.vec_id < b.vec_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_SPATIAL_EPS} * {_SPATIAL_EPS}
""",
    doc="Spatial epsilon-distance join over the first two embedding "
    f"dimensions: all point pairs within eps={_SPATIAL_EPS} "
    "(Euclidean), each pair once (id_a < id_b). The Spark side is "
    "grid-bucketed — each point lands in its eps-sized cell, one "
    "side replicates into the 3x3 neighbor cells, and the join is a "
    "pure EQUI-join on the cell key with the exact distance as a "
    "post-filter — provably identical output to the naive all-pairs "
    "oracle because any pair within eps differs by at most one cell "
    "per axis.",
    scale_notes="The quadratic all-pairs comparison exists only in "
    "the DuckDB oracle. Spark compares ~9 x cell-occupancy "
    "candidates per point via one hash shuffle on (cx, cy); the 9x "
    "replication is map-side and constant. Skewed cells (dense "
    "regions) salt exactly like any hot hash key; eps controls the "
    "cell granularity. This is the standard distributed spatial-join "
    "recipe (grid partitioning), no BNL, no cross join — "
    "plan-asserted.",
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    ).withColumns(
        {
            "cx": F.floor(F.col("x") / _SPATIAL_EPS).cast("long"),
            "cy": F.floor(F.col("y") / _SPATIAL_EPS).cast("long"),
        }
    )
    offsets = F.explode(
        F.expr(
            "transform(sequence(0, 8), "
            "i -> struct(i div 3 - 1 as dx, i % 3 - 1 as dy))"
        )
    )
    a = (
        pts.withColumn("o", offsets)
        .select(
            F.col("vec_id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("o.dx")).alias("jcx"),
            (F.col("cy") + F.col("o.dy")).alias("jcy"),
        )
    )
    b = pts.select(
        F.col("vec_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jcx"),
        F.col("cy").alias("jcy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, ["jcx", "jcy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= _SPATIAL_EPS * _SPATIAL_EPS)
        .select("id_a", "id_b", F.round(F.sqrt(d2), 4).alias("dist"))
    )
