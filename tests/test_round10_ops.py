"""Property tests for the round-6 infrastructure operators
(operators/infra_ops.py): structural invariants the oracle hash can't
express — packing conservation, SCD2 interval algebra, CDC tombstone
semantics, and the rendezvous-hashing minimal-movement theorem."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.operators.infra_ops import (
    _HRW_NEW,
    _HRW_OLD,
    _PACK_CHUNK,
)
from weather_stream_processor_spark.registry import all_queries
from weather_stream_processor_spark.sources import load_table


def test_packing_conserves_tokens_and_chunks(spark):
    """Per source: Σ chunk fills == Σ doc tokens (nothing lost at chunk
    boundaries), chunk ids are dense 0..n_chunks-1, every chunk hosts >=1
    doc, and pad_tokens is nonzero only on the final chunk."""
    df = all_queries()["concat_chunk_packing_manifest"].builder(spark, SF_SMOKE)
    rows = df.collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    tok_totals = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()
    }
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == set(tok_totals)
    for src, chunk_rows in by_src.items():
        chunk_rows.sort(key=lambda r: r["chunk_id"])
        ids = [r["chunk_id"] for r in chunk_rows]
        assert ids == list(range(len(ids))), f"{src}: chunk ids not dense"
        assert all(r["n_docs"] >= 1 for r in chunk_rows)
        assert all(r["n_starting"] <= r["n_docs"] for r in chunk_rows)
        # conservation: chunks * C - final padding == total tokens
        assert len(ids) * _PACK_CHUNK - chunk_rows[-1]["pad_tokens"] == (
            tok_totals[src]
        ), f"{src}: token conservation broken"
        assert all(r["pad_tokens"] == 0 for r in chunk_rows[:-1])
        assert 0 <= chunk_rows[-1]["pad_tokens"] < _PACK_CHUNK
        # every doc starts in exactly one chunk
        n_docs_src = docs.filter(F.col("source") == src).count()
        assert sum(r["n_starting"] for r in chunk_rows) == n_docs_src


def test_scd2_intervals_partition_history(spark):
    """Per user: versions are 1..n, intervals chain exactly (valid_to ==
    next valid_from), exactly one open current row, and adjacent versions
    never carry the same attribute value (true SCD2 — a no-change row
    would be a spurious version)."""
    rows = (
        all_queries()["scd2_dimension_build"].builder(spark, SF_SMOKE).collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, vr in by_user.items():
        vr.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vr] == list(range(1, len(vr) + 1))
        opens = [r for r in vr if r["valid_to"] is None]
        assert len(opens) == 1 and opens[0] is vr[-1]
        assert all(opens[0]["is_current"] == 1 for _ in [0])
        for a, b in zip(vr, vr[1:]):
            assert a["valid_to"] == b["valid_from"], f"user {uid}: gap/overlap"
            assert a["attr_value"] != b["attr_value"], f"user {uid}: no-op version"
            assert a["is_current"] == 0


def test_cdc_apply_tombstones_and_lww(spark):
    """Keys whose last op is a delete are absent; surviving keys carry the
    value of their LAST upsert (verified against a pandas replay)."""
    ev = load_table(spark, SF_SMOKE, "events").toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    expect: dict[int, tuple] = {}
    counts: dict[int, int] = {}
    for r in ev.itertuples():
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
        if r.event_type == "error":
            expect.pop(r.user_id, None)
        else:
            expect[r.user_id] = round(r.value * 100)
    got = {
        r["user_id"]: (r["final_val_cents"], r["n_ops"])
        for r in all_queries()["cdc_upsert_apply"].builder(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for uid, cents in expect.items():
        assert got[uid][0] == cents, f"user {uid}: last-writer-wins broken"
        assert got[uid][1] == counts[uid]


def test_rendezvous_minimal_movement(spark):
    """The HRW theorem, structurally: growing the ring from 7 to 8 shards
    only ever moves keys INTO the new shard, every shard is populated,
    and no shard hogs the corpus (the r6 fix: a multiply-shift without a
    final mod is order-preserving and collapsed 498/500 keys onto shard
    0)."""
    rows = (
        all_queries()["rendezvous_shard_rebalance"].builder(spark, SF_SMOKE).collect()
    )
    total = sum(r["n_docs"] for r in rows)
    moved = [r for r in rows if r["moved"] == 1]
    assert all(r["shard_new"] == _HRW_NEW - 1 for r in moved), (
        "HRW violated: a key moved between surviving shards"
    )
    assert all(
        r["shard_old"] == r["shard_new"] for r in rows if r["moved"] == 0
    )
    occupancy: dict[int, int] = {}
    for r in rows:
        occupancy[r["shard_new"]] = occupancy.get(r["shard_new"], 0) + r["n_docs"]
    assert set(occupancy) == set(range(_HRW_NEW)), "an empty shard"
    assert max(occupancy.values()) < total * 0.5, "degenerate placement"
    assert 0 < sum(r["n_docs"] for r in moved) < total * 0.5
    assert set(range(_HRW_OLD)) == {r["shard_old"] for r in rows}
