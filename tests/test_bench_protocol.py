"""bench.py self-adjudication helpers (pure units — no Spark, no timing).

The r5 official bench artifact carried normalized_spread=14.36 — flagged
untrustworthy by its own protocol while the good evidence sat in
bench_history.  r6 makes the artifact standalone: the session extends
itself with more interleaved pairs while the spread exceeds SPREAD_TRUST,
and the best contiguous window is reported as the adjudicated fallback.
"""

from bench import SPREAD_TRUST, best_contiguous_window


def test_r5_artifact_pairs_adjudicate_to_tight_window():
    # the actual r5 pairs: one stolen-window pair, two good ones
    win = best_contiguous_window([0.19, 2.73, 2.56])
    assert win == {"start": 1, "len": 2, "median": 2.645, "spread": 1.07}
    assert win["spread"] <= SPREAD_TRUST


def test_longest_qualifying_window_wins():
    # uniform ratios: the whole run is the window
    assert best_contiguous_window([2.0, 2.0, 2.0]) == {
        "start": 0, "len": 3, "median": 2.0, "spread": 1.0}
    # a mid-run spike splits the run; the LONGEST stretch under the trust
    # bar wins (not the absolute tightest pair — more pairs, more evidence)
    win = best_contiguous_window([1.0, 1.1, 0.9, 5.0, 1.05])
    assert (win["start"], win["len"]) == (0, 3)
    assert win["spread"] <= SPREAD_TRUST


def test_r6_live_extension_vector_adjudicates_to_long_window():
    # the actual r6 extended session: pair 0 poisoned by a control spike,
    # pairs 1-7 form a trustworthy 7-pair stretch
    pairs = [0.281, 2.458, 3.11, 2.766, 2.503, 2.578, 1.996, 1.348]
    win = best_contiguous_window(pairs)
    assert (win["start"], win["len"]) == (1, 7)
    assert win["spread"] <= SPREAD_TRUST


def test_degenerate_inputs():
    assert best_contiguous_window([]) is None
    assert best_contiguous_window([1.0]) is None


def test_trust_bar_matches_documented_protocol():
    # CLAUDE.md / BENCH docs say ~3x is the usable band on this host
    assert SPREAD_TRUST == 3.0
