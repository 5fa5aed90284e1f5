"""Mechanical near-duplicate screen over the operator registry (r6 verdict
task 7): round 6 caught an RFM duplicate pre-commit and had to excise a
Benford near-duplicate post-commit — this converts that vigilance into a
gate. Any NEW pair scoring >= DUP_THRESHOLD under the IDF-weighted word
overlap fails here until either the operator is redesigned or the pair is
consciously grandfathered via tools.registry_dupscreen.write_baseline()."""

from __future__ import annotations

from tools.registry_dupscreen import (
    DUP_THRESHOLD,
    baseline_pairs,
    new_flagged_pairs,
    registry_bags,
    scored_pairs,
    word_bag,
)

# The operator excised post-commit in round 6 (git 437dc39), reconstructed
# verbatim: the screen MUST flag it against the surviving
# benford_digit_profile — the calibration case for DUP_THRESHOLD.
_EXCISED_BENFORD_DOC = (
    "BENFORD'S-LAW FIRST-DIGIT AUDIT over order totals — the "
    "forensic-accounting screen for fabricated or truncated numeric "
    "columns (real multiplicative quantities put ~30.1% of first digits "
    "at 1; synthetic/uniform generators don't, which this fixture "
    "demonstrates). Per digit 1-9: observed count, Benford's expected "
    "probability as a LITERAL integer ppb constant (log10(1+1/d) "
    "precomputed — neither engine evaluates a transcendental, so there "
    "is no libm drift to hash), and the exact integer deviation "
    "n_obs*1e9 - n*p_e9 (positive = over-represented). The chi-square "
    "statistic assembles from these integers in the property test. "
    "Plan: one projection + one 9-group aggregate — map-side combine "
    "carries everything; the digit extraction is string head of the "
    "integer part, identical semantics both engines."
)


def test_no_new_near_duplicate_operators():
    flagged = new_flagged_pairs()
    assert not flagged, (
        "possible duplicate operators (redesign, or consciously "
        "grandfather via tools.registry_dupscreen.write_baseline()): "
        + "; ".join(f"{a} ~ {b} ({s:.3f})" for s, a, b in flagged)
    )


def test_screen_would_have_caught_the_benford_duplicate():
    bags = registry_bags()
    assert "benford_digit_profile" in bags  # the surviving operator
    bags["benford_first_digit_audit"] = word_bag(
        "benford_first_digit_audit",
        _EXCISED_BENFORD_DOC,
        ("analytics", "audit", "quality", "statistics"),
    )
    flagged = new_flagged_pairs(bags)
    assert any(
        {a, b} == {"benford_digit_profile", "benford_first_digit_audit"}
        for _, a, b in flagged
    ), flagged


def test_baseline_names_exist_in_registry():
    """Grandfathered pairs must reference live operators — a rename or
    removal invalidates its baseline rows (regenerate the file)."""
    names = set(registry_bags())
    stale = [
        p for p in baseline_pairs() if p[0] not in names or p[1] not in names
    ]
    assert not stale, stale


def test_identical_doc_scores_one():
    bags = {
        "a_thing": word_bag("a_thing", "winsorized kurtosis screen", ("x",)),
        "b_thing": word_bag("b_thing", "winsorized kurtosis screen", ("x",)),
        "c_other": word_bag("c_other", "haversine geodesic buckets", ("y",)),
    }
    pairs = {(a, b): s for s, a, b in scored_pairs(bags)}
    assert pairs[("a_thing", "b_thing")] >= 0.99
    assert pairs.get(("a_thing", "c_other"), 0.0) < DUP_THRESHOLD
