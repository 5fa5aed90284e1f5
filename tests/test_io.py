"""Format-IO tests: schema-enforced CSV/JSONL round-trips, corrupt-row
quarantine (the batch dead-letter path), and partition pruning on
date-partitioned parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.sources import load_table
from weather_stream_processor_spark.sources.io import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_partitioned_parquet,
)

_DOCS_DDL = "doc_id long, lang string, source string, n_chars long"


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _as_sorted_tuples(df):
    return sorted(map(tuple, df.select("doc_id", "lang", "source", "n_chars").collect()))


def test_csv_roundtrip_preserves_values(spark, tmp_path):
    src = _docs(spark)
    path = str(tmp_path / "docs_csv")
    write_csv(src, path)
    back = read_csv(spark, path, _DOCS_DDL)
    assert _as_sorted_tuples(back) == _as_sorted_tuples(src)
    assert dict(back.dtypes)["doc_id"] == "bigint"  # schema enforced, not inferred


def test_jsonl_roundtrip_preserves_values(spark, tmp_path):
    src = _docs(spark)
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, _DOCS_DDL)
    assert _as_sorted_tuples(back) == _as_sorted_tuples(src)


def test_read_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_csv(spark, str(tmp_path), None)
    with pytest.raises(ValueError, match="explicit schema"):
        read_jsonl(spark, str(tmp_path), None)


def test_jsonl_corrupt_rows_are_quarantined_not_dropped(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-000.json").write_text(
        '{"doc_id": 1, "lang": "en"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "lang": "de"}\n'
    )
    schema = f"doc_id long, lang string, {CORRUPT_COL} string"
    back = read_jsonl(spark, str(p), schema).cache()
    try:
        good = back.filter(F.col(CORRUPT_COL).isNull())
        bad = back.filter(F.col(CORRUPT_COL).isNotNull())
        assert {r.doc_id for r in good.collect()} == {1, 2}
        assert bad.count() == 1  # quarantined with raw line, not silently dropped
        assert "not json" in bad.collect()[0][CORRUPT_COL]
    finally:
        back.unpersist()  # session-scoped fixture: don't leak into later tests


def test_partitioned_parquet_prunes_on_partition_filter(spark, tmp_path):
    src = _docs(spark)
    path = str(tmp_path / "docs_by_lang")
    write_partitioned_parquet(src, path, ["lang"])
    back = spark.read.parquet(path)
    one_lang = back.filter(F.col("lang") == "en")
    # values survive the round trip
    expected = {t for t in _as_sorted_tuples(src) if t[1] == "en"}
    got = {
        (r.doc_id, r.lang, r.source, r.n_chars)
        for r in one_lang.collect()
    }
    assert got == expected
    # and the filter prunes DIRECTORIES, not rows: it must appear in the
    # scan's PartitionFilters, not as a post-scan data filter
    plan = one_lang._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "lang" in pf_line


def test_partitioned_write_rejects_empty_partition_spec(spark, tmp_path):
    with pytest.raises(ValueError, match="unpartitioned"):
        write_partitioned_parquet(_docs(spark), str(tmp_path / "x"), [])


def test_orc_roundtrip_preserves_values(spark, tmp_path):
    from weather_stream_processor_spark.sources.io import read_orc, write_orc

    src = _docs(spark)
    path = str(tmp_path / "docs_orc")
    write_orc(src, path)
    back = read_orc(spark, path, _DOCS_DDL)
    assert _as_sorted_tuples(back) == _as_sorted_tuples(src)


def test_merged_schema_reads_across_generations(spark, tmp_path):
    """Additive schema evolution: generation 1 lacks the `lang` column a
    later generation added; the merged read surfaces it as NULL for gen-1
    rows and intact for gen-2 rows, with values otherwise unchanged."""
    from weather_stream_processor_spark.sources.io import (
        read_parquet_merged_schema,
    )

    src = _docs(spark)
    gen1 = str(tmp_path / "gen1")
    gen2 = str(tmp_path / "gen2")
    old = src.filter(F.col("source") == "web").drop("lang")
    new = src.filter(F.col("source") != "web")
    old.write.parquet(gen1)
    new.write.parquet(gen2)

    merged = read_parquet_merged_schema(spark, gen1, gen2)
    assert set(merged.columns) == {"doc_id", "lang", "source", "n_chars"}
    assert merged.count() == src.count()
    # gen-1 rows: lang is null; gen-2 rows: lang survives byte-for-byte
    assert merged.filter((F.col("source") == "web") & F.col("lang").isNotNull()).count() == 0
    got_new = sorted(
        map(tuple, merged.filter(F.col("source") != "web")
            .select("doc_id", "lang", "source", "n_chars").collect())
    )
    assert got_new == sorted(
        map(tuple, new.select("doc_id", "lang", "source", "n_chars").collect())
    )
