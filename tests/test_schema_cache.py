"""Focused tests for the read_table schema cache's r13-hardened
``_path_sig`` (guide §6 / r12 ADVICE items): bounded stat work, nested
layouts never cached, race-safety, and rewrite invalidation."""

from __future__ import annotations

import os

from weather_etl_spark.io import _SCHEMA_CACHE, _path_sig, read_table


def test_flat_dir_signature_changes_on_rewrite(tmp_path):
    d = tmp_path / "t.parquet"
    d.mkdir()
    f = d / "part-0"
    f.write_bytes(b"x" * 10)
    s1 = _path_sig(str(d))
    assert s1 is not None
    # same mtime-granularity trap: size change alone must invalidate
    os.utime(f, ns=(1, 1))
    os.utime(d, ns=(1, 1))
    base = _path_sig(str(d))
    f.write_bytes(b"y" * 20)
    os.utime(f, ns=(1, 1))
    os.utime(d, ns=(1, 1))
    assert _path_sig(str(d)) != base


def test_nested_dir_is_never_cached(tmp_path):
    d = tmp_path / "t.parquet"
    (d / "part=1").mkdir(parents=True)
    (d / "part=1" / "f").write_bytes(b"x")
    assert _path_sig(str(d)) is None


def test_many_files_skip_the_stat_loop(tmp_path):
    d = tmp_path / "t.parquet"
    d.mkdir()
    for i in range(65):
        (d / f"part-{i:03d}").write_bytes(b"x")
    assert _path_sig(str(d)) is None
    # at or under the bound the signature exists
    (d / "part-064").unlink()
    assert _path_sig(str(d)) is not None


def test_missing_path_returns_none_not_raises(tmp_path):
    assert _path_sig(str(tmp_path / "nope")) is None


def test_read_table_still_correct_with_and_without_cache(spark, sf_dir):
    _SCHEMA_CACHE.clear()
    df1 = read_table(spark, sf_dir, "nation")
    assert df1.count() > 0
    # second read hits the cache; schema identical
    df2 = read_table(spark, sf_dir, "nation")
    assert df1.schema == df2.schema
