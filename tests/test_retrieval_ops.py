"""Invariant tests for the round-3 retrieval / robust-stats / layout batch.

Value-level parity with DuckDB is covered for every entry by
test_oracle_parity.py; these assert the semantic properties the oracle
hash alone can't express (dominance, graph closure, probability bounds,
bit-interleave geometry).
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_skyline_is_mutually_nondominated(spark):
    from weather_stream_processor_spark.operators.analytics import (
        skyline_size_price,
    )

    pts = [(r.p_size, r.best_price) for r in skyline_size_price(spark, SF_SMOKE).collect()]
    assert pts
    for s1, p1 in pts:
        for s2, p2 in pts:
            if (s1, p1) == (s2, p2):
                continue
            # no point may be >= in size AND <= in price (i.e. dominate)
            assert not (s2 >= s1 and p2 <= p1), f"{(s2, p2)} dominates {(s1, p1)}"


def test_skyline_points_are_real_parts(spark):
    from weather_stream_processor_spark.operators.analytics import (
        skyline_size_price,
    )
    from weather_stream_processor_spark.sources import load_table

    part = {
        (r.p_size, r.p_retailprice)
        for r in load_table(spark, SF_SMOKE, "part")
        .select("p_size", "p_retailprice")
        .collect()
    }
    for r in skyline_size_price(spark, SF_SMOKE).collect():
        assert (r.p_size, r.best_price) in part


def test_triangles_close_over_the_edge_set(spark):
    from weather_stream_processor_spark.operators.analytics import (
        brand_triangle_communities,
    )

    tris = brand_triangle_communities(spark, SF_SMOKE).collect()
    assert tris  # threshold must leave a non-trivial graph at fixture scale
    for t in tris:
        # canonical orientation: each triangle appears exactly once, ordered
        assert t.ba < t.bb < t.bc
    assert len(tris) == len({(t.ba, t.bb, t.bc) for t in tris})


def test_bm25_scores_positive_and_query_terms_present(spark):
    from weather_stream_processor_spark.operators.text import (
        _BM25_TERMS,
        bm25_top_docs,
    )
    from weather_stream_processor_spark.sources import load_table

    top = bm25_top_docs(spark, SF_SMOKE).collect()
    assert 0 < len(top) <= 20
    assert all(r.bm25 > 0 for r in top)
    # every returned doc must actually contain >= 1 query term
    docs = dict(
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    )
    for r in top:
        assert any(t in docs[r.doc_id].split(" ") for t in _BM25_TERMS)


def test_boolean_and_search_is_posting_intersection(spark):
    from weather_stream_processor_spark.operators.text import boolean_and_search
    from weather_stream_processor_spark.sources import load_table

    hits = {r.doc_id for r in boolean_and_search(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    expect = {
        r.doc_id
        for r in docs
        if "spark" in r.text.split(" ") and "vector" in r.text.split(" ")
    }
    assert hits == expect


def test_weighted_sample_rate_tracks_weight(spark):
    from weather_stream_processor_spark.operators.sampling import (
        weighted_bernoulli_sample,
    )
    from weather_stream_processor_spark.sources import load_table

    kept = weighted_bernoulli_sample(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert kept
    # p = ceil(0.8*min(n_chars,500))/1000 <= 0.8 -> HT weight >= 1.25
    assert all(r.ht_weight >= 1.25 for r in kept)
    # the HT estimate of the corpus size should be near n_docs
    est = sum(r.ht_weight for r in kept)
    assert 0.5 * n_docs <= est <= 2.0 * n_docs
    # deterministic: identical membership on a rerun
    again = {r.doc_id for r in weighted_bernoulli_sample(spark, SF_SMOKE).collect()}
    assert {r.doc_id for r in kept} == again


def test_zorder_cells_cover_rectangles(spark):
    from weather_stream_processor_spark.operators.sampling import zorder_cell_stats

    rows = zorder_cell_stats(spark, SF_SMOKE).collect()
    assert rows
    assert all(0 <= r.zcell < 256 for r in rows)
    # de-interleaving the cell key recovers the two 4-bit bucket coords
    def deinterleave(z: int) -> tuple[int, int]:
        x = y = 0
        for i in range(4):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    coords = {deinterleave(r.zcell) for r in rows}
    assert all(0 <= x < 16 and 0 <= y < 16 for x, y in coords)


def test_mad_outlier_profile_bounds(spark):
    from weather_stream_processor_spark.operators.aggregates import (
        mad_outlier_profile,
    )

    rows = mad_outlier_profile(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0
        assert 0 <= r.n_outliers < r.n  # a robust fence never flags everything


def test_inverted_index_df_matches_postings(spark):
    from weather_stream_processor_spark.operators.text import (
        inverted_index_postings,
    )

    for r in inverted_index_postings(spark, SF_SMOKE).collect():
        head = r.postings_head.split(",")
        assert len(head) == min(r.df, 20)
        # sorted ascending doc ids
        ids = [int(x) for x in head]
        assert ids == sorted(ids)
