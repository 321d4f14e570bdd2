"""Benchmark harness (driver contract).

Runs the headline suite on local[$SPARK_GRAFT_CPUS] (default 32) against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extra": {...}}

The headline suite = the flagship per-turn extraction job over a
deterministic synthetic transcript table (seeded, disk-cached under
BENCH/data so generation never pollutes timings) + the operator suite at
the given sf.

Modes:
  python bench.py                    # full suite, one JSON line (driver)
  python bench.py --extract-only     # flagship job only (scaling harness)

Scaling evidence for the north rule's N vs 4N criterion is produced by
tools/scaling_bench.py (two fresh JVMs at local[8] / local[32]).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DATA = os.path.join(REPO, "BENCH", "data", "transcripts_bench")
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "1200"))
SEED = 42
# trust bar for the pair-ratio spread (max/min).  Within ~3× the median of
# pair ratios is a usable round comparable on this host; beyond it the
# session extends itself (bounded) and reports the best contiguous window.
SPREAD_TRUST = 3.0
# probe-for-quiet (r7): BENCH_r06 was captured in a window whose controls
# swung 591 → 4,264 docs/s and needed best-window adjudication.  Before the
# official session starts, sample the mp control until two ADJACENT samples
# agree within this factor (bounded attempts, short sleeps) — cheap
# insurance that the session opens on a minute the host is actually quiet.
QUIET_AGREE = 2.0
# control-clean gate (r7, second fix): a live r7 session showed the probe
# passing (3133→3926) and THEN a co-tenant spike depressing the next four
# controls 5× (3618 → 507/541/675/814 → 3646).  The stolen pairs' ratios
# were mutually consistent (1.95-2.88, spread 1.47) because a depressed
# denominator inflates every ratio the same way — so the best-window rule,
# which only looks at ratio consistency, ADJUDICATED THE SPIKE (median
# 2.13 vs the documented quiet band 0.18-0.63).  The r5/r6 best-window
# medians (2.56/2.41) are the same artifact.  Fix: a pair only qualifies
# for a trusted window if its normalizing control is within this factor of
# the session's best control sample — the quiet minutes define the
# silicon, the depressed ones define the co-tenant.
CTL_CLEAN = 2.0


def probe_quiet(cpus: int, max_probes: int, sleep_s: float) -> tuple[list[float], bool]:
    """Sample the mp control until two adjacent samples agree within
    QUIET_AGREE× (→ quiet=True) or the probe budget runs out (→ start
    anyway, quiet=False — the session's own pair protocol + self-extension
    still adjudicates).  Returns (samples, quiet)."""
    from tools.scaling_bench import mp_control

    samples: list[float] = []
    for i in range(max(2, max_probes)):
        c, _ = mp_control(cpus)
        samples.append(c)
        if len(samples) >= 2:
            a, b = samples[-2], samples[-1]
            if min(a, b) > 0 and max(a, b) / min(a, b) <= QUIET_AGREE:
                return samples, True
        if i < max_probes - 1 and sleep_s > 0:
            time.sleep(sleep_s)
    return samples, False


def best_contiguous_window(ratios: list[float],
                           clean: list[bool] | None = None) -> dict | None:
    """Best contiguous run of pair ratios (len ≥ 2): the LONGEST window
    whose spread is within SPREAD_TRUST (more pairs = stronger evidence),
    ties broken by tighter spread then later start; if no window meets the
    trust bar, fall back to the tightest window overall.  A stolen minute
    poisons one or two adjacent pairs; the surviving contiguous stretch is
    the window the host actually offered, and reporting it alongside the
    full set lets the artifact be judged standalone.

    ``clean`` (parallel to ``ratios``) marks pairs whose normalizing
    control was itself healthy (within CTL_CLEAN× of the session's best
    control).  When given, only all-clean windows can QUALIFY: consistent
    ratios over depressed controls are the co-tenant's signature, not the
    silicon's (see CTL_CLEAN note).  The returned dict carries
    ``clean``: whether the chosen window is all-clean."""
    from statistics import median as _median

    def _all_clean(i: int, j: int) -> bool:
        return clean is None or all(clean[i:j])

    best = None
    for i in range(len(ratios)):
        for j in range(i + 2, len(ratios) + 1):
            w = ratios[i:j]
            sp = max(w) / min(w)
            # qualifying windows (spread ≤ trust AND control-clean) sort
            # ahead of all non-qualifying ones; within each class:
            # longest, then tightest, then latest
            ok = sp <= SPREAD_TRUST and _all_clean(i, j)
            key = (not ok, -(j - i) if ok else 0, round(sp, 6), -i)
            if best is None or key < best[0]:
                best = (key, i, j)
    if best is None:
        return None
    _, i, j = best
    w = ratios[i:j]
    return {"start": i, "len": j - i,
            "median": round(_median(w), 3),
            "spread": round(max(w) / min(w), 2),
            "clean": _all_clean(i, j)}

OPS_QUERIES = [
    "dedup_exact", "dedup_simhash", "dedup_minhash", "dedup_lsh_pairs",
    "dedup_near", "dedup_clusters", "dedup_embedding", "ann_cosine_topk",
    "ann_bandor_topk", "ann_ivf_topk", "topk_per_group",
    "score_propagation", "sessionize", "token_counts", "lang_id",
    "pii_redact", "decontaminate", "decontaminate_bloom", "link_pagerank",
    "search_topk", "pack_sequences", "length_quantiles", "semdedup",
    "line_dedup", "repeated_substr", "dsir_select", "lm_score",
    "bpe_merges", "bpe_encode", "curation_funnel", "dedup_incremental",
    "serde_roundtrip",
]


def build(cpus: int):
    from readability_spark.pipeline import build_session
    spark = build_session(
        "readability-bench", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_bench_data(spark) -> int:
    """Materialize the deterministic transcript table once; return row count."""
    from readability_spark.transcripts import write_transcripts
    write_transcripts(spark, BENCH_DATA, n_convs=N_CONVS, seed=SEED)
    return spark.read.parquet(BENCH_DATA).count()


def warm_workers(spark) -> None:
    """Spawn + warm every Python worker (imports, JIT) on a small slice so
    the measurement reflects steady-state throughput, not worker spawn."""
    from readability_spark.udfs import extract_udf

    df = spark.read.parquet(BENCH_DATA).limit(512).repartition(
        spark.sparkContext.defaultParallelism * 2)
    df.withColumn("x", extract_udf("text")).select("x.page_type").count()


def run_extract(spark) -> tuple[float, int]:
    """Flagship job: salted repartition → extraction → count of non-null
    page_type (forces full materialization, discards the payload)."""
    from pyspark.sql import functions as F
    from readability_spark.pipeline import n_buckets_for, run_extraction

    df = spark.read.parquet(BENCH_DATA)
    t0 = time.time()
    out = run_extraction(df, num_buckets=n_buckets_for(spark))
    n = out.agg(
        F.count("page_type"),
        F.sum("char_yield"),
    ).collect()[0][0]
    return time.time() - t0, n


def main() -> None:
    extract_only = "--extract-only" in sys.argv
    spark = build(CPUS)
    n_turns = ensure_bench_data(spark)

    queries: dict[str, float] = {}
    # corpus fingerprint + forcing mode: round-over-round comparability
    # broke silently in r1→r2 (corpus default changed AND r1's bare count()
    # let Catalyst prune projection-only queries to a parquet row-count);
    # recording both makes any future drift visible in the JSON itself
    extra: dict = {
        "cpus": CPUS, "n_turns": n_turns,
        "corpus": {"n_convs": N_CONVS, "seed": SEED, "n_turns": n_turns},
        "forcing": "bit_xor(xxhash64(struct(*)))",
    }

    warm_workers(spark)
    # Noise control — this VM's effective CPU swings 5-7x between minutes
    # (the r2→r3 "5x swing" was exactly this ambiguity), so a raw wall
    # number can't distinguish a regression from a stolen window.  A plain
    # multiprocessing pool doing the SAME per-doc extraction (no Spark)
    # reports what the silicon offered.  K interleaved (control, extract)
    # PAIRS tighten the band: each extract run is normalized by the control
    # sampled seconds before it, so a stolen minute hits both sides of one
    # pair instead of silently skewing a lone global ratio (observed 285 vs
    # 2362 control docs/s twenty seconds apart).  The JVM is idle while
    # each control runs.  The median pair ratio is the round-over-round
    # comparable; the spread (max/min pair) says how trustworthy it is.
    from statistics import median

    from tools.scaling_bench import mp_control

    if not extract_only:
        # wait for a quiet window before the session opens (bounded; the
        # probe samples are recorded but never join the session controls)
        probes = int(os.environ.get("SPARK_GRAFT_BENCH_PROBES", "8"))
        probe_sleep = float(os.environ.get("SPARK_GRAFT_BENCH_PROBE_SLEEP",
                                           "20"))
        p_samples, p_quiet = probe_quiet(CPUS, probes, probe_sleep)
        extra["quiet_probe"] = {
            "samples": [round(x, 1) for x in p_samples],
            "quiet": p_quiet, "agree_bar": QUIET_AGREE}

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    pair_ratios: list[float] = []
    ctl_samples: list[float] = []
    runs: list[float] = []
    # per-run flank indices into ctl_samples: left = the control sampled
    # immediately before the run, right = immediately after.  Explicit
    # indices (rather than positional i/i+1) let the extension insert
    # re-probe control samples BETWEEN pairs without misattributing them
    # as a run's adjacent flank.
    flanks: list[tuple[int, int]] = []
    n = 0
    if extract_only:
        for _ in range(2):
            dt_i, n = run_extract(spark)
            runs.append(dt_i)
    else:
        ctl_i, _ = mp_control(CPUS)
        ctl_samples.append(ctl_i)
        for _ in range(max(1, reps)):
            left = len(ctl_samples) - 1
            dt_i, n = run_extract(spark)
            runs.append(dt_i)
            # closing/shared bracket: every extract run is flanked by a
            # control on each side; normalize by the max of its two
            # neighbors (a stolen minute usually depresses only one)
            ctl_i, _ = mp_control(CPUS)
            ctl_samples.append(ctl_i)
            flanks.append((left, len(ctl_samples) - 1))
    if not extract_only:
        def _normalizers() -> list[float]:
            return [max(ctl_samples[a], ctl_samples[b]) for a, b in flanks]

        def _ratios() -> list[float]:
            out = []
            for dt_i, c in zip(runs, _normalizers()):
                if c > 0:
                    out.append((n / dt_i) / c)
            return out

        def _clean() -> list[bool]:
            # parallel to _ratios(): same c > 0 filter keeps the lists
            # index-aligned for the window gate
            top = max(ctl_samples)
            return [c >= top / CTL_CLEAN for c in _normalizers() if c > 0]

        pair_ratios = _ratios()
        # Self-adjudication (r6): BENCH_r05.json shipped with spread=14.4 —
        # flagged untrustworthy by this protocol's own rule while the good
        # evidence sat in bench_history.  If no trustworthy contiguous
        # window of at least `reps` pairs exists yet, EXTEND the session
        # with more interleaved (extract, control) pairs — bounded.  The
        # stop condition is on the best WINDOW, not the global spread: the
        # global max/min can only widen as pairs are appended, so one
        # poisoned pair would otherwise force the full extension budget
        # even after plenty of consistent evidence has accumulated.
        def _trusted() -> bool:
            if (len(pair_ratios) >= 2 and all(_clean())
                    and max(pair_ratios) / min(pair_ratios) <= SPREAD_TRUST):
                return True
            win = best_contiguous_window(pair_ratios, _clean())
            return (win is not None and win["spread"] <= SPREAD_TRUST
                    and win["clean"] and win["len"] >= max(2, reps))

        max_extra = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA", "5"))
        # re-probe budget (r7): when the latest control shows the host
        # mid-spike, extension pairs would land inside the spike and burn
        # the budget without ever forming a clean window — wait (bounded)
        # for the control to recover before spending each extra pair.
        reprobes = int(os.environ.get("SPARK_GRAFT_BENCH_REPROBES", "6"))
        reprobe_waits = 0
        extended = 0
        while (extended < max_extra and len(pair_ratios) >= 2
               and not _trusted()):
            while (reprobe_waits < reprobes and ctl_samples[-1] > 0
                   and ctl_samples[-1] < max(ctl_samples) / CTL_CLEAN):
                if probe_sleep > 0:
                    time.sleep(probe_sleep)
                ctl_i, _ = mp_control(CPUS)
                ctl_samples.append(ctl_i)
                reprobe_waits += 1
            left = len(ctl_samples) - 1
            dt_i, n = run_extract(spark)
            runs.append(dt_i)
            ctl_i, _ = mp_control(CPUS)
            ctl_samples.append(ctl_i)
            flanks.append((left, len(ctl_samples) - 1))
            extended += 1
            pair_ratios = _ratios()
        if extended:
            extra["bench_extended_pairs"] = extended
        if reprobe_waits:
            extra["bench_reprobe_waits"] = reprobe_waits
    # The headline stays best-of-the-INITIAL-reps so rounds compare the
    # same protocol (an extended noisy session must not get extra chances
    # at a golden minute that a quiet session never gets); the best across
    # ALL runs is reported separately, labeled as such.
    n_initial = min(len(runs), max(1, reps) if not extract_only else 2)
    dt = min(runs[:n_initial])
    queries["extract_throughput"] = round(dt, 3)
    extra["turns_per_sec"] = round(n / dt, 1)
    extra["runs_sec"] = [round(x, 3) for x in runs]
    if len(runs) > n_initial:
        extra["best_run_sec_all"] = round(min(runs), 3)
        extra["turns_per_sec_best_all"] = round(n / min(runs), 1)

    if not extract_only:
        import __spark_entry__ as entrymod
        qs = entrymod.queries()
        from pyspark.sql import functions as F

        def force(df) -> None:
            # force evaluation THROUGH every output column: a bare count()
            # lets Catalyst prune projection-only queries (token_counts,
            # lang_id) down to a parquet row-count — the exact pitfall the
            # measurement rules call out for UDFs applies to expressions too
            (df.select(F.xxhash64(F.struct("*")).alias("h"))
             .agg(F.expr("bit_xor(h)")).first())   # sum() overflows (ANSI)

        for name in OPS_QUERIES:
            t0 = time.time()
            force(qs[name](spark, SF_DIR))
            queries[name] = round(time.time() - t0, 3)
            # measurement hygiene: no query's cache (e.g. dedup_near's
            # persisted signature table) may occupy memory while the next
            # query is timed
            spark.catalog.clearCache()

        # staged form of dedup_clusters: the pair table is an artifact the
        # previous pipeline stage already produced, so it's materialized
        # OUTSIDE the timer; the timed region is cluster resolution alone.
        # Recorded in extra, NOT in queries — it re-measures work already
        # counted inside dedup_clusters, so adding it to the headline sum
        # would double-count cluster resolution; the value's only purpose
        # is the delta the pairs= parameter removes.
        from readability_spark.ops.dedup import dedup_clusters, near_dedup
        pairs = (near_dedup(spark, SF_DIR)
                 .filter(F.col("is_dup")).localCheckpoint())
        t0 = time.time()
        force(dedup_clusters(spark, SF_DIR, pairs=pairs))
        extra["dedup_clusters_staged_sec"] = round(time.time() - t0, 3)
        spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline suite wall time (flagship per-turn extraction "
                  "over synthetic transcripts + operator suite at sf)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extra": extra,
    }
    spark.stop()

    # Final control sample after spark.stop() so pool and JVM never
    # compete; it joins the per-pair samples for the legacy best-control
    # ratio (band continuity with rounds 1-4).
    if not extract_only:
        ctl_b, _ = mp_control(CPUS)
        ctl_samples.append(ctl_b)
        ctl = max(ctl_samples)
        extra["control_samples"] = [round(x, 1) for x in ctl_samples]
        if ctl > 0:  # a relocated/empty BENCH data dir must not crash the
            extra["control_docs_per_sec"] = round(ctl, 1)  # finished run
            extra["normalized_tp_over_control"] = round(
                extra["turns_per_sec"] / ctl, 3)
        if pair_ratios:
            # the round-over-round comparable: median of per-pair ratios
            # (each extract normalized by ITS adjacent control), plus the
            # spread that says whether this round's number is trustworthy
            extra["normalized_pairs"] = [round(x, 3) for x in pair_ratios]
            extra["normalized_median"] = round(median(pair_ratios), 3)
            spread = max(pair_ratios) / min(pair_ratios)
            extra["normalized_spread"] = round(spread, 2)
            # control-clean gate: recomputed over the FULL control record
            # (the post-stop bracket joins ctl_samples above, so a spike
            # that depressed every in-session control is still unmasked by
            # a quiet closing sample)
            clean = _clean()
            extra["pair_normalizer_ctls"] = [
                round(c, 1) for c in _normalizers()]
            extra["pair_control_clean"] = clean
            # self-adjudication verdict: which median should a reader use?
            win = best_contiguous_window(pair_ratios, clean)
            if spread <= SPREAD_TRUST and all(clean):
                extra["normalized_adjudication"] = "full"
            elif win is not None:
                extra["normalized_best_window"] = win
                extra["normalized_adjudication"] = (
                    "best_window"
                    if win["spread"] <= SPREAD_TRUST and win["clean"]
                    else "untrusted")
            else:
                extra["normalized_adjudication"] = "untrusted"
        # round-over-round band tracking: the driver snapshots one JSON per
        # round, but the band only emerges across runs — append every full
        # bench here so normalized ratios can be compared within the repo
        hist = os.path.join(REPO, "BENCH", "bench_history.jsonl")
        os.makedirs(os.path.dirname(hist), exist_ok=True)
        with open(hist, "a") as f:
            f.write(json.dumps({"t": int(time.time()), **result}) + "\n")

    print(json.dumps(result))


if __name__ == "__main__":
    main()
