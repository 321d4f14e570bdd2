"""bench.py self-adjudication helpers (pure units — no Spark, no timing).

The r5 official bench artifact carried normalized_spread=14.36 — flagged
untrustworthy by its own protocol while the good evidence sat in
bench_history.  r6 makes the artifact standalone: the session extends
itself with more interleaved pairs while the spread exceeds SPREAD_TRUST,
and the best contiguous window is reported as the adjudicated fallback.
"""

from bench import CTL_CLEAN, SPREAD_TRUST, best_contiguous_window


def test_r5_artifact_pairs_adjudicate_to_tight_window():
    # the actual r5 pairs: one stolen-window pair, two good ones
    win = best_contiguous_window([0.19, 2.73, 2.56])
    assert win == {"start": 1, "len": 2, "median": 2.645, "spread": 1.07,
                   "clean": True}
    assert win["spread"] <= SPREAD_TRUST


def test_longest_qualifying_window_wins():
    # uniform ratios: the whole run is the window
    assert best_contiguous_window([2.0, 2.0, 2.0]) == {
        "start": 0, "len": 3, "median": 2.0, "spread": 1.0, "clean": True}
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


def test_control_clean_gate_rejects_the_depressed_control_stretch():
    # the actual r7 live session: the quiet-probe passed, then a co-tenant
    # spike depressed four consecutive controls 5x.  The stolen pairs'
    # ratios were mutually consistent (spread 1.47) because a depressed
    # denominator inflates them all the same way — without the clean mask
    # the window rule adjudicates the spike itself.
    ratios = [0.317, 1.953, 2.133, 2.877]
    clean = [True, False, False, False]   # normalizers 3618/541/675/814
    # ungated (legacy) behavior picks the stolen stretch — and with no
    # mask it has no way to know the stretch is unclean
    legacy = best_contiguous_window(ratios)
    assert (legacy["start"], legacy["len"]) == (1, 3)
    # gated: no all-clean window of len >= 2 exists, so the fallback is
    # reported but marked unclean -> adjudication must NOT trust it
    win = best_contiguous_window(ratios, clean)
    assert win["clean"] is False


def test_control_clean_gate_prefers_the_clean_window():
    # two consistent stretches: a stolen one (inflated ratios, unclean)
    # and a quiet one the extension reached after the re-probe; the gate
    # must pick the clean stretch even though the stolen one is longer
    ratios = [2.4, 2.5, 2.6, 0.31, 0.35]
    clean = [False, False, False, True, True]
    win = best_contiguous_window(ratios, clean)
    assert (win["start"], win["len"], win["clean"]) == (3, 2, True)
    assert win["spread"] <= SPREAD_TRUST


def test_clean_mask_none_means_ungated():
    a = best_contiguous_window([1.0, 1.1, 0.9])
    b = best_contiguous_window([1.0, 1.1, 0.9], [True, True, True])
    assert a == b


def test_ctl_clean_bar_matches_documented_protocol():
    # CLAUDE.md / BENCH docs: a pair qualifies only if its normalizing
    # control is within 2x of the session's best control sample
    assert CTL_CLEAN == 2.0
