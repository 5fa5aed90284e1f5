"""Registry near-duplicate screen (r6 verdict task 7).

The registry is saturated on obvious canon: round 6 caught an RFM
duplicate pre-commit and had to excise a Benford near-duplicate
post-commit. This makes that failure mode mechanical instead of
vigilance: every operator's (name, tags, doc) is reduced to a bag of
rare words, pairs are scored by IDF-weighted overlap, and pytest
(tests/test_registry_hygiene.py) fails on any non-allowlisted pair
above threshold — so a new operator that re-describes an existing one
cannot land.

Score: sim(a, b) = sum(idf(w) for w in bag_a & bag_b)
               / min(sum(idf over bag_a), sum(idf over bag_b))
— rare shared domain words (benford, forensic, winsorize) dominate;
ubiquitous plan words (aggregate, shuffle, oracle) contribute ~0.

Usage: python tools/registry_dupscreen.py [top_n]
"""

from __future__ import annotations

import math
import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_WORD = re.compile(r"[a-z]{4,}")

# Words that describe HOW the repo implements things rather than WHAT an
# operator is — shared by design across the whole registry, excluded so
# they can't mask (or manufacture) topical overlap.
_BOILERPLATE = frozenset(
    """plan shuffle aggregate aggregation oracle duckdb spark hash exact
    integer integers bigint engine engines window keyed partition
    partitions broadcast join joins scan group grouped grouping column
    columns table fixture corpus scale bounded driver collect arrow
    pandas mapinpandas query queries test tests pytest registered
    register pattern cross batch rows count distinct""".split()
)


def word_bag(name: str, doc: str, tags: tuple[str, ...]) -> frozenset[str]:
    words = set(name.lower().split("_"))
    words |= set(_WORD.findall(doc.lower()))
    words |= {t.lower() for t in tags}
    return frozenset(w for w in words if len(w) >= 4 and w not in _BOILERPLATE)


def scored_pairs(
    bags: dict[str, frozenset[str]],
) -> list[tuple[float, str, str]]:
    n = len(bags)
    df: dict[str, int] = {}
    for bag in bags.values():
        for w in bag:
            df[w] = df.get(w, 0) + 1
    idf = {w: math.log(n / c) for w, c in df.items()}
    mass = {name: sum(idf[w] for w in bag) for name, bag in bags.items()}
    names = sorted(bags)
    out: list[tuple[float, str, str]] = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            shared = bags[a] & bags[b]
            if not shared:
                continue
            denom = min(mass[a], mass[b])
            if denom <= 0:
                continue
            out.append((sum(idf[w] for w in shared) / denom, a, b))
    out.sort(reverse=True)
    return out


def registry_bags() -> dict[str, frozenset[str]]:
    from weather_stream_processor_spark.registry import all_queries

    return {
        name: word_bag(name, spec.doc or "", tuple(spec.tags or ()))
        for name, spec in all_queries().items()
    }


if __name__ == "__main__":
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    pairs = scored_pairs(registry_bags())
    for score, a, b in pairs[:top_n]:
        print(f"{score:.3f}  {a}  ~  {b}")


DUP_THRESHOLD = 0.33  # calibrated: the excised r6 Benford pair scores 0.355
_BASELINE_PATH = Path(__file__).resolve().parent / "dupscreen_baseline.json"


def baseline_pairs() -> set[tuple[str, str]]:
    import json

    if not _BASELINE_PATH.exists():
        return set()
    return {tuple(p) for p in json.loads(_BASELINE_PATH.read_text())}


def new_flagged_pairs(
    bags: dict[str, frozenset[str]] | None = None,
) -> list[tuple[float, str, str]]:
    """Pairs above threshold that are NOT grandfathered — the pre-commit
    gate: an operator re-describing an existing one lands here."""
    known = baseline_pairs()
    pairs = scored_pairs(bags if bags is not None else registry_bags())
    return [
        (s, a, b)
        for s, a, b in pairs
        if s >= DUP_THRESHOLD and (a, b) not in known
    ]


def write_baseline() -> int:
    """Freeze every current above-threshold pair as intentional siblings
    (join matrices, mergeable-rollup variants, markov twins...). Run ONLY
    after a human look at the new pairs; the pytest gate compares against
    this file."""
    import json

    pairs = [
        [a, b]
        for s, a, b in scored_pairs(registry_bags())
        if s >= DUP_THRESHOLD
    ]
    _BASELINE_PATH.write_text(json.dumps(pairs, indent=0) + "\n")
    return len(pairs)
