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
  timeseries.py   time spine/gap-fill, feature-store primitives, day-grid
                  sequence + trend diagnostics over `events`
  sampling.py     deterministic + stratified sampling, drift tests,
                  rank statistics, Horvitz-Thompson (training-data mix)
  tpch.py         the adapted TPC-H q1-q22 sweep (§2.6 relational)
  analytics.py    graph, survival/competing-risks, attribution (§2.6)
  curation.py     semdedup/DSIR/decontam + feature screens (§2.6 LLM)
  mixture.py      training-mixture assembly and drift (§2.6 LLM)
  geo.py          haversine nearest-facility, grid-blocked spatial join
  evals.py        AUC/AP/ECE/Brier, experimentation suite (lift, CUPED,
                  DiD, Qini, TOST, MDE, SRM, Bayesian), advisors
  labeling.py     agreement, voting, Dawid-Skene, Bradley-Terry, pass@k,
                  MRR/isotonic/gains
  report.py       composed capstones: dedup cascade, release audit,
                  eval scorecard, experiment readout, drift panel
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

# round-6 additions: training-pipeline / warehouse infrastructure ops
# (self-contained — import order after report is arbitrary)
from weather_stream_processor_spark.operators import infra_ops  # noqa: E402,F401
