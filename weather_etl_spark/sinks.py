"""Parquet sinks: idempotent keyed append + partitioned writes.

The reference's sink is ``INSERT ... ON CONFLICT (date) DO NOTHING``
(/root/reference/lambda_function.py:176-186, operator A11) — an
idempotent keyed append in one transaction.  Plain Parquet has no
MERGE or PK, so the engine's equivalent (SURVEY.md §7.5) is:

    new.dropDuplicates(key)                 # dedup within the batch
       .join(existing, key, "left_anti")    # drop keys already present
       -> write.mode("append")              # append only the novel rows

Crash safety: Spark's Parquet committer stages task output under
``_temporary`` and commits per job, so a failed write leaves no
visible files; a re-run after any failure re-applies the same
anti-join and converges (at-least-once attempt + keyed dedup =
exactly-once effect — reference invariant #1, SURVEY.md §2).

Scale notes (100 TB): the anti-join only needs the sink's KEY column
(column-pruned scan over parquet footers); with a date-partitioned
sink and a bounded cursor window the existing-side scan prunes to the
overlap partitions — the same trick the reference uses with
``past_days=1`` (A14).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel


def idempotent_append(
    spark: SparkSession,
    new_rows: DataFrame,
    sink_path: str,
    key_cols: Sequence[str],
) -> int:
    """Append only rows whose key is not already in the sink.

    Returns the number of rows inserted (the reference returns
    ``cursor.rowcount`` the same way, lambda_function.py:186,190).
    """
    deduped = new_rows.dropDuplicates(list(key_cols))
    if os.path.exists(sink_path):
        existing_keys = spark.read.parquet(sink_path).select(*key_cols)
        to_insert = deduped.join(existing_keys, on=list(key_cols), how="left_anti")
    else:
        to_insert = deduped
    # Persist the anti-join output so the sink-scan + anti-join plan
    # executes exactly ONCE per run: count materializes the cache, the
    # write replays it.  (Count-then-write on the raw plan would run the
    # merge twice — at 100 TB that doubles the merge cost, and a
    # non-deterministic source could report a count that differs from
    # the rows written.)  The cache is bounded by the BATCH size (the
    # cursor window), never the sink size.  The count doubles as the
    # empty-input short-circuit (A12): no rows -> no write job at all.
    to_insert = to_insert.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        inserted = to_insert.count()
        if inserted > 0:
            to_insert.write.mode("append").parquet(sink_path)
    finally:
        to_insert.unpersist()
    return inserted


def write_partitioned(
    df: DataFrame,
    sink_path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Partitioned Parquet write — the engine's 100 TB layout primitive.

    Partition columns become directory keys (``col=value``), giving
    free partition pruning to every downstream cursor/date filter.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(sink_path)
