"""As-of join semantics: inclusive at-or-before matching, deterministic
ties, NULL for users with no prior error."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from readability_spark.ops.relational import asof_last_error


def test_asof_semantics_on_gate_corpus(spark):
    sf = "/root/testdata/sf0.001"
    rows = asof_last_error(spark, sf).collect()
    ev = {r["event_id"]: r for r in
          spark.read.parquet(f"{sf}/events.parquet").collect()}
    assert len(rows) == len(ev)
    by_user: dict = {}
    for e in sorted(ev.values(), key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(e["user_id"], []).append(e)
    for r in rows:
        e = ev[r["event_id"]]
        # brute-force expectation: max-ts error at-or-before, max id on ties
        cand = [q for q in by_user[e["user_id"]]
                if q["event_type"] == "error" and q["ts"] <= e["ts"]]
        if not cand:
            assert r["last_error_event_id"] is None
            assert r["us_since_error"] is None
            continue
        best_ts = max(q["ts"] for q in cand)
        best = max(q["event_id"] for q in cand if q["ts"] == best_ts)
        assert r["last_error_event_id"] == best, (r, best)
        td = e["ts"] - best_ts
        assert r["us_since_error"] == (
            td.days * 86_400_000_000 + td.seconds * 1_000_000
            + td.microseconds)
        # an error event matches itself: inclusive as-of
        if e["event_type"] == "error":
            assert r["us_since_error"] == 0 or r["last_error_event_id"] != \
                e["event_id"]
    # at least one error event pairs with itself (inclusivity is exercised)
    self_paired = [r for r in rows
                   if ev[r["event_id"]]["event_type"] == "error"
                   and r["last_error_event_id"] == r["event_id"]]
    assert self_paired
