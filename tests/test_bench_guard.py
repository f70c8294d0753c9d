"""Bench regression guard: previous-round parsing + delta flagging
(pure functions — no Spark session needed)."""

from __future__ import annotations

import json

from bench import (
    compute_regressions,
    previous_round_bench,
    previous_round_timings,
)


def test_compute_regressions_flags_only_real_slowdowns():
    prev = {"q01": 1.0, "q02": 0.04, "q03": 2.0, "q04": 1.0}
    now = {
        "q01": 1.4,   # +40% and +0.4s -> flagged
        "q02": 0.09,  # +125% but only +0.05s -> jitter, not flagged
        "q03": 2.2,   # +10% -> under threshold
        "q04": 0.8,   # faster
        "q05": 9.9,   # new query, no baseline
    }
    regs = compute_regressions(prev, now)
    assert set(regs) == {"q01"}
    assert regs["q01"]["pct"] == 40.0
    assert compute_regressions(None, now) == {}
    assert compute_regressions({}, now) == {}


def test_compute_regressions_calibration_normalized():
    """A uniformly slow host (the r5 false-alarm storm: every query up
    26-296% in raw seconds, calibration 2x) must flag NOTHING once the
    calibration ratio divides it out; a genuine regression on top of the
    slow host must still be flagged, with both raw and normalized times."""
    prev = {"q01": 1.0, "q02": 2.0, "q03": 0.5}
    # host 2x slower across the board: raw seconds all doubled
    uniform = {"q01": 2.0, "q02": 4.0, "q03": 1.0}
    assert compute_regressions(prev, uniform, calibration_ratio=2.0) == {}
    # same slow host, but q02 ALSO genuinely regressed 2x
    real = {"q01": 2.0, "q02": 8.0, "q03": 1.0}
    regs = compute_regressions(prev, real, calibration_ratio=2.0)
    assert set(regs) == {"q02"}
    assert regs["q02"]["now"] == 8.0
    assert regs["q02"]["now_normalized"] == 4.0
    assert regs["q02"]["pct"] == 100.0
    # degenerate ratio never divides by zero
    assert compute_regressions(prev, uniform, calibration_ratio=0.0)


def test_previous_round_bench_recovers_truncated_tail(tmp_path):
    """The driver records only the LAST bytes of stdout, so the JSON line
    often arrives with its head cut off (BENCH_r05's actual shape). The
    flat queries object and the calibration scalar must still parse."""
    line = json.dumps(
        {"metric": "bench_total_sec", "value": 9.0, "unit": "sec",
         "queries": {"q01": 1.5, "q02": 2.5}, "sf": 0.1,
         "calibration_sec": 1.005, "regressions": {}}
    )
    truncated = line[len('{"metric": "bench_total_sec", "va'):]
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"n": 5, "rc": 0, "tail": truncated})
    )
    blob = previous_round_bench(str(tmp_path))
    assert blob["queries"] == {"q01": 1.5, "q02": 2.5}
    assert blob["calibration_sec"] == 1.005


def test_previous_round_bench_carries_calibration(tmp_path):
    line = json.dumps(
        {"metric": "bench_total_sec", "value": 3.0, "unit": "sec",
         "queries": {"q01": 1.5}, "calibration_sec": 0.9}
    )
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"n": 5, "rc": 0, "tail": "noise\n" + line + "\n"})
    )
    blob = previous_round_bench(str(tmp_path))
    assert blob["queries"] == {"q01": 1.5}
    assert blob["calibration_sec"] == 0.9


def test_previous_round_timings_reads_driver_envelope(tmp_path):
    line = json.dumps(
        {"metric": "bench_total_sec", "value": 3.0, "unit": "sec",
         "queries": {"q01": 1.5, "q02": 1.5}, "sf": 0.1}
    )
    # driver envelope: our JSON line buried in "tail" amid Spark noise
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"n": 3, "rc": 0, "tail": "WARN noise\n" + line + "\n"})
    )
    # an older round that must NOT win
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"n": 1, "rc": 0, "queries": {"q01": 9.9}})
    )
    assert previous_round_timings(str(tmp_path)) == {"q01": 1.5, "q02": 1.5}


def test_previous_round_timings_direct_shape_and_missing(tmp_path):
    assert previous_round_timings(str(tmp_path)) is None
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"queries": {"q01": 2.0}})
    )
    assert previous_round_timings(str(tmp_path)) == {"q01": 2.0}
    # corrupt newest file -> None, never a crash in the bench
    (tmp_path / "BENCH_r05.json").write_text("{not json")
    assert previous_round_timings(str(tmp_path)) is None


def test_previous_round_bench_surfaces_method_marker(tmp_path):
    line = json.dumps(
        {"metric": "bench_total_sec", "value": 3.0, "unit": "sec",
         "queries": {"q01": 1.5}, "bench_method": "min2",
         "calibration_sec": 0.2}
    )
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"n": 7, "rc": 0, "tail": "noise\n" + line + "\n"})
    )
    blob = previous_round_bench(str(tmp_path))
    assert blob["bench_method"] == "min2"
    # truncated-tail recovery also finds the marker
    truncated = line[len('{"metric": "bench_total_sec", "va'):]
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"n": 8, "rc": 0, "tail": truncated})
    )
    blob = previous_round_bench(str(tmp_path))
    assert blob["bench_method"] == "min2"
    assert blob["queries"] == {"q01": 1.5}


def test_compute_regressions_ref_scale_uses_replay_ratio():
    """ref_scale_* entries normalize by the replay subprocess's OWN
    calibration ratio, not the parent loop's — the r9 phantom: the replay
    ran under 8x neighbor load while the in-session calibration was clean,
    so the un-normalized 140.3 s read as +544% on code that re-measured
    FASTER than the previous round."""
    prev = {"q01": 1.0, "ref_scale_fit_sec": 17.0}
    now = {"q01": 1.0, "ref_scale_fit_sec": 140.0}
    # parent host clean (ratio 1.0) but replay host 8x slower: normalized
    # 140/8 = 17.5 -> inside noise, nothing flagged
    assert (
        compute_regressions(
            prev, now, calibration_ratio=1.0, ref_scale_ratio=8.0
        )
        == {}
    )
    # without the replay ratio the ref_scale entry falls back to the
    # parent ratio and false-flags (the r9 behavior, kept as fallback)
    regs = compute_regressions(prev, now, calibration_ratio=1.0)
    assert set(regs) == {"ref_scale_fit_sec"}
    # a REAL replay regression still flags under its own clean ratio
    regs2 = compute_regressions(
        prev, now, calibration_ratio=1.0, ref_scale_ratio=1.0
    )
    assert set(regs2) == {"ref_scale_fit_sec"}
    # and the replay ratio never leaks onto in-session queries
    slow = {"q01": 3.0, "ref_scale_fit_sec": 17.0}
    regs3 = compute_regressions(
        prev, slow, calibration_ratio=1.0, ref_scale_ratio=8.0
    )
    assert set(regs3) == {"q01"}


def test_ref_ratio_in_regime_bounds():
    from bench import CALIBRATION_RATIO_FENCE, ref_ratio_in_regime

    assert ref_ratio_in_regime(1.0)
    assert ref_ratio_in_regime(CALIBRATION_RATIO_FENCE)
    assert ref_ratio_in_regime(1.0 / CALIBRATION_RATIO_FENCE)
    assert not ref_ratio_in_regime(CALIBRATION_RATIO_FENCE * 1.01)
    assert not ref_ratio_in_regime(0.9 / CALIBRATION_RATIO_FENCE)
    assert not ref_ratio_in_regime(None)
    assert not ref_ratio_in_regime(0.0)
    assert not ref_ratio_in_regime(-1.0)


def test_reconstruction_recovers_ref_scale_calibration(tmp_path):
    """The replay's calibration scalar must survive head-clipped tails
    (it prints after the queries object), and the plain 'calibration_sec'
    regex must not swallow it (quote-anchored)."""
    tail = (
        '"q01_pricing_summary": 1.5, "ref_scale_fit_sec": 9.0, '
        '"bench_method": "min2", "ref_scale_method": "min2_fit_cal", '
        '"calibration_sec": 0.25, "ref_scale_calibration_sec": 0.31, '
        '"regressions": {}}'
    )
    (tmp_path / "BENCH_r11.json").write_text(json.dumps({"tail": tail}))
    blob = previous_round_bench(str(tmp_path))
    assert blob["calibration_sec"] == 0.25
    assert blob["ref_scale_calibration_sec"] == 0.31
    assert blob["ref_scale_method"] == "min2_fit_cal"
    assert blob["queries"]["ref_scale_fit_sec"] == 9.0


def test_fence_ref_scale_on_method_change():
    from bench import REF_SCALE_METHOD, fence_ref_scale

    prev = {"q01": 1.0, "ref_scale_fit_sec": 13.1,
            "ref_scale_warm_ann_sec": 0.69}
    # previous round predates the marker (or used another method): the
    # replay entries drop out, in-session queries still compare
    assert fence_ref_scale(prev, None) == {"q01": 1.0}
    assert fence_ref_scale(prev, "single-shot") == {"q01": 1.0}
    # same method: everything compares
    assert fence_ref_scale(prev, REF_SCALE_METHOD) == prev
    assert fence_ref_scale(None, None) is None


def test_fence_scope_tags_drops_changed_and_resumes_on_match(monkeypatch):
    """A query whose scope tag changed since the previous round (or that
    gained one) is excluded from the comparison for ONE round; once the
    previous blob carries the same tag, comparison resumes. Tag-free
    queries are never touched. (Synthetic tags via monkeypatch — r17
    retired the last real ones.)"""
    import bench
    from bench import fence_scope_tags

    monkeypatch.setattr(
        bench, "SCOPE_TAGS", {"q50_minhash_lsh_neardup": "rX-guard"}
    )
    prev = {"q50_minhash_lsh_neardup": 3.2, "q01": 1.0}
    # previous round carried no tag for it: the newly tagged q50 is fenced
    fenced, dropped = fence_scope_tags(prev, {})
    assert dropped == ["q50_minhash_lsh_neardup"]
    assert fenced == {"q01": 1.0}
    # previous round recorded the SAME tags: nothing fenced
    fenced2, dropped2 = fence_scope_tags(prev, dict(bench.SCOPE_TAGS))
    assert dropped2 == [] and fenced2 == prev
    # tag RETIREMENT fences too: the previous round carried a tag the
    # current code no longer does (r15 retired the r9-r12 tags)
    prev3 = {"q40_text_profile_suite": 1.6, "q01": 1.0}
    fenced3, dropped3 = fence_scope_tags(
        prev3, {"q40_text_profile_suite": "r11-bc-lemma-arm"}
    )
    assert dropped3 == ["q40_text_profile_suite"]
    assert fenced3 == {"q01": 1.0}
    # None baseline passes through
    assert fence_scope_tags(None, {}) == (None, [])


def test_reconstruction_ignores_query_spread_ratios(tmp_path):
    """BENCH_r09's actual shape: the head-clipped tail starts MID-queries
    and ALSO carries the query_spread block, whose "qNN": ratio pairs must
    not overwrite (or stand in for) the real timings — r9 ADVICE reproduced
    a baseline of 0.35 (a spread ratio) instead of 1.62 (the timing)."""
    tail = (
        '_cosine_topk": 1.449, "q72_curate_pipeline": 1.62, '
        '"sf": 0.1, "bench_method": "min2", "calibration_sec": 0.282, '
        '"query_spread": {"q72_curate_pipeline": 0.35, '
        '"q01_pricing_summary": 1.751}, '
        '"extra_sampled": ["q02_top_revenue_orders"], '
        '"scope_tags": {"q80_trainprep_composed": "r9-full-lifecycle"}, '
        '"regressions": {"q53_embedding_neardup_pairs": {"prev": 2.7}}}'
    )
    (tmp_path / "BENCH_r09.json").write_text(json.dumps({"tail": tail}))
    blob = previous_round_bench(str(tmp_path))
    # the clipped leading pair ("..._cosine_topk") has a mangled name and
    # is dropped by the allowlist; the intact timing survives untouched
    assert blob["queries"] == {"q72_curate_pipeline": 1.62}
    # spread-only names never enter the timings
    assert "q01_pricing_summary" not in blob["queries"]
    assert blob["calibration_sec"] == 0.282
    assert set(blob["regressions"]) == {"q53_embedding_neardup_pairs"}
    assert blob["scope_tags"] == {
        "q80_trainprep_composed": "r9-full-lifecycle"
    }


def test_reconstruction_recovers_scope_tags_and_nonq_flags(tmp_path):
    """The truncated-tail fallback must recover scope_tags and keep
    non-q flagged names (incremental_admit) for min-of-3 targeting."""
    import bench

    tail = (
        '"q54_neardup_clusters": 4.7, "incremental_admit": 2.4, '
        '"calibration_sec": 0.22, "bench_method": "min2", '
        '"regressions": {"q54_neardup_clusters": {"prev": 1}, '
        '"incremental_admit": {"prev": 2}}, '
        '"scope_tags": {"q30_window_agg_suite": "r9-stream-arm"}}'
    )
    (tmp_path / "BENCH_r42.json").write_text(
        json.dumps({"tail": tail})
    )
    blob = previous_round_bench(str(tmp_path))
    assert blob["queries"]["incremental_admit"] == 2.4
    assert set(blob["regressions"]) == {
        "q54_neardup_clusters", "incremental_admit"
    }
    assert blob["scope_tags"] == {"q30_window_agg_suite": "r9-stream-arm"}


def test_reconstruction_handles_r13_pct_flags_and_end_resample(tmp_path):
    """r13 compact-line shape: regressions carry bare pct numbers (not
    detail dicts) and end_resampled carries "qNN": seconds pairs — the
    scraper must still recover the flagged NAMES and must cut before
    end_resampled so its displaced samples never masquerade as timings."""
    tail = (
        '"q57_repetition_metrics": 0.791, "calibration_sec": 0.26, '
        '"bench_method": "min2", '
        '"end_resampled": {"q57_repetition_metrics": 0.546, '
        '"q02_top_revenue_orders": 0.944}, '
        '"regressions": {"q57_repetition_metrics": 45.2, '
        '"ref_scale_fit_sec": -12.0}}'
    )
    (tmp_path / "BENCH_r13.json").write_text(json.dumps({"tail": tail}))
    blob = previous_round_bench(str(tmp_path))
    assert blob["queries"] == {"q57_repetition_metrics": 0.791}
    assert "q02_top_revenue_orders" not in blob["queries"]
    assert set(blob["regressions"]) == {
        "q57_repetition_metrics", "ref_scale_fit_sec"
    }


def test_needs_resample_variance_escalation():
    """Exactly-two samples with relative spread over the bound escalate;
    already-escalated (3), single-shot (1), low-spread, and slow-min
    (> RESAMPLE_MIN_CAP_SEC — an extra sample would cost too much under
    the very load that caused the spread) sample sets do not."""
    from bench import needs_resample

    assert needs_resample([1.0, 1.5])          # spread 0.5 > 0.35
    assert not needs_resample([1.0, 1.3])      # spread 0.3 within bound
    assert not needs_resample([1.0])           # single-shot (>60s first)
    assert not needs_resample([1.0, 1.5, 1.1])  # already min-of-3
    assert not needs_resample([11.0, 30.0])    # min over the 10s cap
    assert needs_resample([9.9, 30.0])         # just under the cap


def test_compute_regressions_subunity_ratio_never_amplifies():
    """The r10 phantom storm: a quiet host makes the pure-CPU calibration
    job run 30% faster than the loaded previous round's, but real queries
    (fixed driver/scheduling overheads) barely move — dividing by the
    sub-unity ratio inflated +10-17% raw deltas into +60-84% flags. The
    check is one-sided, so sub-unity ratios clamp to 1.0 (raw compare);
    slow-host ratios > 1 still divide timings down, and the same clamp
    applies to the replay-side ref_scale ratio."""
    prev = {"q01": 1.0, "ref_scale_fit_sec": 10.0}
    now = {"q01": 1.15, "ref_scale_fit_sec": 11.0}
    assert (
        compute_regressions(
            prev, now, calibration_ratio=0.7, ref_scale_ratio=0.7
        )
        == {}
    )
    # a genuine regression still flags at its RAW size on the fast host
    real = {"q01": 1.5, "ref_scale_fit_sec": 10.0}
    regs = compute_regressions(prev, real, calibration_ratio=0.7)
    assert set(regs) == {"q01"}
    assert regs["q01"]["now_normalized"] == 1.5
    assert regs["q01"]["pct"] == 50.0


def _realistic_r11_stdout(flagged=("q53_embedding_neardup_pairs",)):
    """Both stdout lines exactly as bench.main prints them, with the REAL
    r11 query list (BENCH_QUERIES + every non-loop entry) — the shape the
    driver truncates to its last 2000 bytes."""
    import bench

    names = list(bench.BENCH_QUERIES) + [
        "catalog_warm", "incremental_admit", "ann_warm_query", "batch_ann",
        "ref_scale_fit_sec", "ref_scale_warm_ann_sec",
        "ref_scale_cold_ann_sec", "ref_scale_trainprep_sec",
        "ref_scale_stage_gen", "ref_scale_stage_tokenize",
        "ref_scale_stage_cv_fit", "ref_scale_stage_idf_fit",
        "ref_scale_stage_transform",
    ]
    timings = {n: round(12.234 + i * 0.111, 3) for i, n in enumerate(names)}
    recall = {
        "q61_knn_lsh_embeddings": 0.93,
        "q62_knn_ivf_embeddings": 0.86,
    }
    out = {
        "metric": "bench_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "bench_method": bench.BENCH_METHOD,
        "ref_scale_method": bench.REF_SCALE_METHOD,
        "calibration_sec": 0.223,
        "calibration_ratio_vs_prev": 0.791,
        "ref_scale_calibration_sec": 0.196,
        "calibration_mem_sec": 0.645,
        "ref_scale_loadavg_1m": [31.8, 42.5],  # r12: regime witness
        # r17: the trainprep lifecycle's per-stage rows — must ride the
        # compact line without displacing the timings
        "ref_scale_trainprep_rows": {
            "corpus": 605000, "curated": 216841, "neardup": 56785,
            "band_decontam": 24513, "packed_slices": 24644,
        },
        "bench_loadavg_1m": [8.4, 15.9],  # r13: main-sweep bracket
        "headline_scope": bench.HEADLINE_SCOPE,
        "recall_at5": recall,
        "query_spread": bench.cap_spread(
            {n: 0.04 + (i % 20) * 0.1 for i, n in enumerate(names)}
        ),
        "extra_sampled_n": 18,
        "extra_sampled": ["q01_pricing_summary", "q21_doc_scalar_suite"],
        "scope_tags": bench.SCOPE_TAGS,
        # r18: the persisted-full-blob pointer rides both lines
        "run": bench.run_id_for(timings),
        # r13: displaced end-of-run samples for the flagged set
        "end_resampled": {k: 1.234 for k in flagged},
        "regressions": {
            k: {"prev": 1.0, "now": 2.0, "now_normalized": 2.0, "pct": 100.0}
            for k in flagged
        },
        # r17: one drift flag in the worst-case shape
        "drift": {
            k: {"baseline": 1.0, "baseline_round": 14, "now": 1.6,
                "now_normalized": 1.55, "pct": 55.0}
            for k in flagged
        },
        "regressions_note": "headline bench_total_sec composition changed",
    }
    return (
        json.dumps(out) + "\n" + bench.compact_line(out, recall),
        timings,
    )


def test_compact_line_survives_2000_byte_tail(tmp_path):
    """r10 VERDICT #1 done-criterion: truncate the REAL r11-shaped stdout
    to its last 2000 bytes (what the driver records) and assert EVERY
    per-query timing — plus the calibrations, method markers, scope tags,
    headline scope, recall, and flagged names — survives reconstruction."""
    stdout, timings = _realistic_r11_stdout()
    tail = stdout[-2000:]
    (tmp_path / "BENCH_r11.json").write_text(
        json.dumps({"n": 11, "rc": 0, "tail": tail})
    )
    blob = previous_round_bench(str(tmp_path))
    assert blob is not None
    assert blob["queries"] == timings            # all ~38, bit-identical
    assert blob["calibration_sec"] == 0.223
    assert blob["ref_scale_calibration_sec"] == 0.196
    import bench

    assert blob["bench_method"] == bench.BENCH_METHOD
    assert blob["ref_scale_method"] == bench.REF_SCALE_METHOD
    assert blob["headline_scope"] == bench.HEADLINE_SCOPE
    assert blob["scope_tags"] == bench.SCOPE_TAGS
    assert set(blob["regressions"]) == {"q53_embedding_neardup_pairs"}
    # r13: the compact line carries the flag MAGNITUDE and the displaced
    # end-of-run sample, and both survive the window
    assert blob["regressions"]["q53_embedding_neardup_pairs"] == 100.0
    assert blob["end_resampled"] == {"q53_embedding_neardup_pairs": 1.234}
    assert blob["bench_loadavg_1m"] == [8.4, 15.9]


def test_compact_line_carries_headline_total():
    """r16 (VERDICT r15 #3): the headline total and its same-composition
    previous-round twin must survive the driver's tail window — the main
    blob's 'value' header is what head-clipping removes first."""
    import json

    import bench

    out = {
        "queries": {"q01_x": 1.0},
        "sf": 0.1,
        "bench_method": bench.BENCH_METHOD,
        "ref_scale_method": bench.REF_SCALE_METHOD,
        "headline_scope": bench.HEADLINE_SCOPE,
        "value": 12.345,
        "bench_total_prev_sec": 11.5,
        "calibration_sec": 0.2,
        "calibration_mem_sec": 0.6,
        "bench_loadavg_1m": [1.0, 2.0],
        "scope_tags": {},
        "regressions": {},
    }
    slim = json.loads(bench.compact_line(out, {}))
    assert slim["bench_total_sec"] == 12.345
    assert slim["bench_total_prev_sec"] == 11.5


def test_compact_line_fits_tail_window_with_margin():
    """The compact line only helps if it fits the driver's window WHOLE.
    Worst-case realistic shape (38+ timings, both calibrations, recall,
    scope tags, a flagged query) must stay comfortably under 2000 bytes."""
    import bench

    stdout, _ = _realistic_r11_stdout()
    compact = stdout.rsplit("\n", 1)[1]
    assert len(compact.encode()) <= bench.COMPACT_LINE_BUDGET


def test_clipped_leading_brace_does_not_abort_recovery(tmp_path):
    """A head-clip landing right before a '{' inside the main blob used to
    feed an unparseable fragment to json.loads and abort the WHOLE
    recovery via the outer ValueError catch — the per-line parse must
    skip it and still find the compact line below."""
    stdout, timings = _realistic_r11_stdout()
    compact = stdout.rsplit("\n", 1)[1]
    fragment = '{"prev": 1.0, "now": 2.0}, "queries" oops not json'
    (tmp_path / "BENCH_r11.json").write_text(
        json.dumps({"n": 11, "rc": 0, "tail": fragment + "\n" + compact})
    )
    blob = previous_round_bench(str(tmp_path))
    assert blob is not None and blob["queries"] == timings


def test_last_queries_line_wins(tmp_path):
    """When both the full blob and the compact line survive whole, the
    LAST one (compact — printed last, most complete under truncation)
    must be the one returned."""
    import bench

    full = json.dumps(
        {"metric": "bench_total_sec", "value": 1.0, "unit": "sec",
         "queries": {"q01": 9.9}, "bench_method": "stale"}
    )
    out = {
        "queries": {"q01": 1.5},
        "sf": 0.1,
        "bench_method": bench.BENCH_METHOD,
        "ref_scale_method": bench.REF_SCALE_METHOD,
        "headline_scope": bench.HEADLINE_SCOPE,
        "calibration_sec": 0.5,
        "scope_tags": {},
        "regressions": {},
    }
    compact = bench.compact_line(out, {})
    (tmp_path / "BENCH_r11.json").write_text(
        json.dumps({"n": 11, "rc": 0, "tail": full + "\n" + compact})
    )
    blob = previous_round_bench(str(tmp_path))
    assert blob["queries"] == {"q01": 1.5}
    assert blob["bench_method"] == bench.BENCH_METHOD


def test_cap_spread_reports_only_noisy_entries():
    """Meta-growth bound (r10 VERDICT #5): sub-bound spreads say 'clean
    sample' and are omitted; noisy ones survive rounded to 2 decimals."""
    from bench import cap_spread

    spread = {"q01": 0.04, "q02": 0.349, "q03": 0.351, "q04": 1.5678}
    assert cap_spread(spread) == {"q03": 0.35, "q04": 1.57}


def test_stage_entries_reconstruct_but_not_calibration():
    """The pair-scraping fallback must accept the new ref_scale_stage_*
    TIMINGS but never let ref_scale_calibration_sec masquerade as one."""
    import bench
    import re

    pat = re.compile(r"^(q\d+(_|$)|ref_scale_(?!calibration)[a-z_]+)")
    assert pat.match("ref_scale_stage_cv_fit")
    assert pat.match("ref_scale_fit_sec")
    assert not pat.match("ref_scale_calibration_sec")


def test_compact_line_degrades_under_flag_storm():
    """An r5-shape storm (25 flagged queries) must not push the compact
    line past the tail window: the guard trims flagged names to 10, then
    drops them entirely — but NEVER the timings, which must survive
    bit-identical at every degradation level."""
    import bench

    stdout, timings = _realistic_r11_stdout(
        flagged=tuple(sorted(timings_key for timings_key in [
            f"q{i:02d}_some_rather_long_query_name" for i in range(25)
        ]))
    )
    compact = stdout.rsplit("\n", 1)[1]
    assert len(compact.encode()) <= bench.COMPACT_LINE_BUDGET
    blob = json.loads(compact)
    assert blob["queries"] == timings
    assert len(blob.get("regressions", {})) <= 10


def test_compute_regressions_median_shift_absorbs_uniform_slowdown():
    """r12: a host-regime shift the CPU calibration can't see (I/O,
    page cache) slows EVERY query ~40% — the median-of-ratios stage must
    absorb it instead of flagging the whole board, while a genuine 3x
    regression riding on top still flags (with the shift recorded)."""
    prev = {f"q{i:02d}_x": 1.0 for i in range(12)}
    uniform = {k: 1.4 for k in prev}
    assert compute_regressions(prev, uniform) == {}

    real = dict(uniform)
    real["q03_x"] = 3.0
    regs = compute_regressions(prev, real)
    assert set(regs) == {"q03_x"}
    assert regs["q03_x"]["host_shift_median"] == 1.4
    # normalized seconds are reported net of the shift (3-decimal field)
    assert abs(regs["q03_x"]["now_normalized"] - 3.0 / 1.4) < 1e-3


def test_compute_regressions_median_shift_needs_samples():
    """With < 8 compared queries the median path must stay out — a thin
    comparison cannot manufacture a regime shift, so a uniform slowdown
    on 4 queries still flags (the pre-r12 behavior)."""
    prev = {f"q{i:02d}_x": 1.0 for i in range(4)}
    now = {k: 1.4 for k in prev}
    regs = compute_regressions(prev, now)
    assert set(regs) == set(prev)


def test_compute_regressions_median_shift_one_sided():
    """A FASTER typical query (median < 1) must not renormalize — the
    one-sided policy: normalization may only relieve flag pressure."""
    prev = {f"q{i:02d}_x": 1.0 for i in range(12)}
    now = {k: 0.7 for k in prev}
    now["q05_x"] = 1.3  # a real +30% regression on a fast host
    regs = compute_regressions(prev, now)
    assert set(regs) == {"q05_x"}
    assert "host_shift_median" not in regs["q05_x"]


def test_reconstruction_ignores_ref_scale_resampled_stages(tmp_path):
    """r15: the replay's in-subprocess displaced samples print as a
    ref_scale_resampled block holding PLAIN stage names (idf_fit, ...) —
    the tail scraper's allowlist must keep them out of the reconstructed
    timings while the real ref_scale_stage_* entries still recover."""
    tail = (
        '"q01_pricing_summary": 0.4, "ref_scale_stage_idf_fit": 5.1, '
        '"calibration_sec": 0.26, "bench_method": "min2", '
        '"ref_scale_resampled": {"cv_fit": 2.0, "idf_fit": 2.2, '
        '"materialize": 1.4}, '
        '"regressions": {"ref_scale_stage_idf_fit": 156.2}}'
    )
    (tmp_path / "BENCH_r14.json").write_text(json.dumps({"tail": tail}))
    blob = previous_round_bench(str(tmp_path))
    assert blob["queries"] == {
        "q01_pricing_summary": 0.4,
        "ref_scale_stage_idf_fit": 5.1,
    }
    assert "idf_fit" not in blob["queries"]
    assert set(blob["regressions"]) == {"ref_scale_stage_idf_fit"}


def test_compact_line_carries_ref_scale_resampled():
    """The escalation witness must survive the tail window alongside the
    flags it adjudicates."""
    from bench import compact_line

    out = {
        "queries": {"q01_pricing_summary": 0.4, "ref_scale_stage_idf_fit": 5.1},
        "sf": 0.1,
        "bench_method": "min2",
        "ref_scale_method": "min2_fit_cal_staged",
        "headline_scope": "x",
        "calibration_sec": 0.26,
        "scope_tags": {},
        "ref_scale_resampled": {"cv_fit": 2.0, "idf_fit": 2.2},
        "regressions": {"ref_scale_stage_idf_fit": {"pct": 156.2}},
    }
    line = compact_line(out, {})
    parsed = json.loads(line)
    assert parsed["ref_scale_resampled"] == {"cv_fit": 2.0, "idf_fit": 2.2}
    assert parsed["regressions"] == {"ref_scale_stage_idf_fit": 156.2}


def _hist(rounds):
    """History blobs (newest first) from (round, queries, cal, tags)."""
    import bench

    return [
        {
            "round": rnd,
            "queries": q,
            "calibration_sec": cal,
            "scope_tags": tags,
            "bench_method": bench.BENCH_METHOD,
        }
        for rnd, q, cal, tags in rounds
    ]


def test_compute_drift_catches_compounding_subthreshold_slide():
    """VERDICT r16 #1 done-criterion: three consecutive +15% steps (each
    under the 25%/round gate) must flag vs the oldest round (+52%
    cumulative), while the single-round channel stays silent."""
    from bench import compute_drift, compute_regressions

    hist = _hist([
        (16, {"q53": 1.32, "q01": 1.0}, 0.2, {}),
        (15, {"q53": 1.15, "q01": 1.0}, 0.2, {}),
        (14, {"q53": 1.00, "q01": 1.0}, 0.2, {}),
    ])
    now = {"q53": 1.52, "q01": 1.0}
    # each round-step is ~+15%: the one-sided 25% gate never fires
    assert compute_regressions(hist[0]["queries"], now) == {}
    flags = compute_drift(
        hist, now, calibration_sec=0.2, current_tags={}
    )
    assert set(flags) == {"q53"}
    assert flags["q53"]["baseline"] == 1.0
    assert flags["q53"]["baseline_round"] == 14
    assert flags["q53"]["pct"] == 52.0
    # +10%/round (+33% cumulative) stays under the 40% drift gate
    mild = {"q53": 1.33, "q01": 1.0}
    assert compute_drift(hist, mild, calibration_sec=0.2, current_tags={}) == {}


def test_compute_drift_fences_tag_mismatched_rounds():
    """A history round that recorded a DIFFERENT scope tag for the query
    measures different work — it must not enter the drift comparison;
    rounds with the matching (or equally absent) tag still do. This is
    exactly the r17 retirement shape: r15/r16 carried r15-bucket-guard,
    r14 and the current round carry none, so q53 compares vs r14."""
    from bench import compute_drift

    hist = _hist([
        (16, {"q53": 3.70}, 0.27, {"q53": "r15-bucket-guard"}),
        (15, {"q53": 3.05}, 0.22, {"q53": "r15-bucket-guard"}),
        (14, {"q53": 2.33}, 0.27, {}),
    ])
    flags = compute_drift(
        hist, {"q53": 3.70}, calibration_sec=0.27, current_tags={}
    )
    assert set(flags) == {"q53"} and flags["q53"]["baseline_round"] == 14
    # with the current tag still in place, only r15/r16 compare — and the
    # +21% step vs the min of those stays under the drift gate
    flags2 = compute_drift(
        hist,
        {"q53": 3.70},
        calibration_sec=0.27,
        current_tags={"q53": "r15-bucket-guard"},
    )
    assert flags2 == {}


def test_compute_drift_normalizes_per_round_and_is_one_sided():
    """A slow host this round divides down by each history round's own
    calibration ratio (clamped >= 1, one-sided — a FAST host never
    inflates); a hot-host historical round records inflated timings AND
    an inflated calibration, so it only loosens its own comparison."""
    from bench import compute_drift

    hist = _hist([
        (16, {"q01": 1.0}, 0.2, {}),
        (15, {"q01": 2.0}, 0.4, {}),  # recorded on a 2x-slower host
        (14, {"q01": 1.0}, 0.2, {}),
    ])
    # now-host 2x slower than r14/r16: 2.2 normalizes to 1.1 vs those
    # rounds, and compares 2.2/2.0 raw vs the equally-slow r15 -> no flag
    assert compute_drift(hist, {"q01": 2.2}, calibration_sec=0.4,
                         current_tags={}) == {}
    # fast host now (ratio < 1 vs every round) must NOT inflate: raw 1.2
    # stays 1.2 (+20%) -> no flag
    assert compute_drift(hist, {"q01": 1.2}, calibration_sec=0.1,
                         current_tags={}) == {}
    # genuine +120% on a same-regime host flags, binding round recorded
    flags = compute_drift(hist, {"q01": 2.2}, calibration_sec=0.2,
                          current_tags={})
    assert set(flags) == {"q01"} and flags["q01"]["pct"] == 120.0
    assert flags["q01"]["baseline"] == 1.0


def test_compute_drift_skips_ref_scale_and_tiny_and_method_change():
    """ref_scale_* entries stay OUT of the drift comparison unless the
    caller passes the replay's own calibration scalar + method (the
    pre-replay preliminary pass never does); sub-100ms deltas are jitter;
    rounds from another bench methodology never enter the history."""
    import bench
    from bench import compute_drift

    hist = _hist([
        (16, {"ref_scale_fit_sec": 1.0, "q01": 0.05, "q02": 1.0}, 0.2, {}),
    ])
    now = {"ref_scale_fit_sec": 2.0, "q01": 0.09, "q02": 2.0}
    flags = compute_drift(hist, now, calibration_sec=0.2, current_tags={})
    assert set(flags) == {"q02"}
    hist[0]["bench_method"] = "single-shot"
    assert compute_drift(hist, now, calibration_sec=0.2,
                         current_tags={}) == {}
    assert compute_drift([], now, calibration_sec=0.2, current_tags={}) == {}


def test_compute_drift_ref_scale_with_replay_calibration():
    """r18 (VERDICT r17 #3 done-criterion): with the replay calibration
    scalar + method passed, a 2x ref_scale_trainprep_sec slide FLAGS in
    the committed drift block; a replay-methodology change fences the
    comparison; replay-host normalization divides by the replay-vs-replay
    ratio (one-sided, clamped >= 1) and never leaks the parent's ratio."""
    import bench
    from bench import compute_drift

    hist = _hist([
        (17, {"ref_scale_trainprep_sec": 94.2, "q01": 1.0}, 0.28, {}),
    ])
    hist[0]["ref_scale_method"] = bench.REF_SCALE_METHOD
    hist[0]["ref_scale_calibration_sec"] = 0.278
    now = {"ref_scale_trainprep_sec": 188.4, "q01": 1.0}
    flags = compute_drift(
        hist, now, calibration_sec=0.28, current_tags={},
        ref_scale_calibration_sec=0.278,
        ref_scale_method=bench.REF_SCALE_METHOD,
    )
    assert set(flags) == {"ref_scale_trainprep_sec"}
    assert flags["ref_scale_trainprep_sec"]["baseline"] == 94.2
    assert flags["ref_scale_trainprep_sec"]["baseline_round"] == 17
    assert flags["ref_scale_trainprep_sec"]["pct"] == 100.0
    # a 2x-slower replay host divides the slide away (its own scalar,
    # not the parent's — calibration_sec stays 0.28 here)
    assert compute_drift(
        hist, now, calibration_sec=0.28, current_tags={},
        ref_scale_calibration_sec=0.556,
        ref_scale_method=bench.REF_SCALE_METHOD,
    ) == {}
    # replay-methodology change fences the entry entirely
    assert compute_drift(
        hist, now, calibration_sec=0.28, current_tags={},
        ref_scale_calibration_sec=0.278,
        ref_scale_method="min3_other",
    ) == {}
    # and in-session queries never normalize by the replay scalar
    slow_q = {"ref_scale_trainprep_sec": 94.2, "q01": 1.5}
    flags2 = compute_drift(
        hist, slow_q, calibration_sec=0.28, current_tags={},
        ref_scale_calibration_sec=0.556,
        ref_scale_method=bench.REF_SCALE_METHOD,
    )
    assert set(flags2) == {"q01"}


def test_previous_round_benches_reads_last_three(tmp_path):
    """The drift history comes straight off the committed BENCH_r*.json
    files — newest first, each tagged with its round number, envelope and
    direct shapes both accepted."""
    from bench import previous_round_benches

    for n, cal in ((14, 0.27), (15, 0.22), (16, 0.27)):
        line = json.dumps({
            "queries": {"q53": float(n)}, "calibration_sec": cal,
            "bench_method": "min2", "scope_tags": {},
        })
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"n": n, "rc": 0, "tail": "noise\n" + line})
        )
    (tmp_path / "BENCH_r13.json").write_text(
        json.dumps({"queries": {"q53": 13.0}, "bench_method": "min2"})
    )
    hist = previous_round_benches(str(tmp_path), limit=3)
    assert [b["round"] for b in hist] == [16, 15, 14]
    assert [b["queries"]["q53"] for b in hist] == [16.0, 15.0, 14.0]
    assert previous_round_benches(str(tmp_path), limit=2)[-1]["round"] == 15


def test_compact_line_carries_drift_block():
    """Drift flags must survive the tail window (name -> pct) and drop
    cleanly in the flag-storm degrade path."""
    import bench

    out = {
        "queries": {"q01_x": 1.0},
        "sf": 0.1,
        "bench_method": bench.BENCH_METHOD,
        "ref_scale_method": bench.REF_SCALE_METHOD,
        "headline_scope": bench.HEADLINE_SCOPE,
        "calibration_sec": 0.2,
        "bench_loadavg_1m": [1.0, 2.0],
        "scope_tags": {},
        "regressions": {},
        "drift": {"q53": {"baseline": 2.33, "now": 3.7, "pct": 58.0}},
    }
    slim = json.loads(bench.compact_line(out, {}))
    assert slim["drift"] == {"q53": 58.0}
    out2 = dict(out, drift={})
    assert "drift" not in json.loads(bench.compact_line(out2, {}))


def test_persist_full_blob_round_trip_and_prune(tmp_path):
    """persist_full_blob appends complete results (pruned to the keep
    bound) and full_blob_for finds them by run id — the committed disk
    record the r17 flag storm proved stdout cannot be."""
    import bench
    from bench import full_blob_for, persist_full_blob, run_id_for

    for i in range(bench.BENCH_HISTORY_KEEP + 5):
        timings = {"q01_x": 1.0 + i, "q02_x": 2.0}
        persist_full_blob(
            str(tmp_path),
            {"queries": timings, "run": run_id_for(timings),
             "regressions": {"q01_x": {"pct": 40.0 + i}}},
        )
    lines = (tmp_path / bench.BENCH_HISTORY_FILE).read_text().splitlines()
    assert len(lines) == bench.BENCH_HISTORY_KEEP  # pruned
    want = {"q01_x": 1.0 + bench.BENCH_HISTORY_KEEP + 4, "q02_x": 2.0}
    got = full_blob_for(str(tmp_path), {"run": run_id_for(want)})
    assert got is not None
    assert got["queries"] == want
    assert got["regressions"]["q01_x"]["pct"] == 44.0 + bench.BENCH_HISTORY_KEEP
    # unknown run id -> no match, never a crash
    assert full_blob_for(str(tmp_path), {"run": "ffffffff"}) is None
    assert full_blob_for(str(tmp_path / "nowhere"), {"run": "x"}) is None


def test_parse_bench_file_upgrades_storm_truncated_tail(tmp_path):
    """The r17 failure, end to end: a 25-flag storm degrades the compact
    line (flag blocks trimmed/dropped to fit the 2000-byte window), but
    the persisted full blob — matched through the surviving run id —
    restores EVERY flag, the drift block, and the displaced samples."""
    import bench
    from bench import persist_full_blob, previous_round_bench

    flagged = tuple(
        sorted(f"q{i:02d}_some_rather_long_query_name" for i in range(25))
    )
    stdout, timings = _realistic_r11_stdout(flagged=flagged)
    full_line, compact = stdout.rsplit("\n", 1)
    full = json.loads(full_line)
    persist_full_blob(str(tmp_path), full)
    # the driver keeps only the last 2000 bytes — the degraded compact
    # line survives, the full blob does not
    (tmp_path / "BENCH_r18.json").write_text(
        json.dumps({"n": 18, "rc": 0, "tail": stdout[-2000:]})
    )
    blob = previous_round_bench(str(tmp_path))
    assert blob is not None
    assert blob["queries"] == timings
    # the compact line alone carries <= 10 flags; the upgraded blob has
    # all 25 with their full detail dicts, plus drift + end_resampled
    assert set(blob["regressions"]) == set(flagged)
    assert blob["regressions"][flagged[0]]["pct"] == 100.0
    assert set(blob["drift"]) == set(flagged)
    assert blob["end_resampled"] == {k: 1.234 for k in flagged}


def test_full_blob_matches_by_timings_without_run_id(tmp_path):
    """Rounds recorded before r18 (or a tail whose run id was clipped)
    still upgrade when enough shared timings match bit-identically; a
    different run's blob never matches."""
    from bench import full_blob_for, persist_full_blob

    timings = {f"q{i:02d}_x": round(1.1 * i, 3) for i in range(1, 9)}
    persist_full_blob(
        str(tmp_path),
        {"queries": timings, "drift": {"q03_x": {"pct": 55.0}}},
    )
    got = full_blob_for(str(tmp_path), {"queries": dict(timings)})
    assert got is not None and got["drift"] == {"q03_x": {"pct": 55.0}}
    # a truncated subset (fewer recovered timings) still matches
    subset = {k: timings[k] for k in list(timings)[:6]}
    assert full_blob_for(str(tmp_path), {"queries": subset}) is not None
    # too few shared keys, or any value mismatch -> no match
    assert full_blob_for(
        str(tmp_path), {"queries": {k: timings[k] for k in list(timings)[:3]}}
    ) is None
    wrong = dict(timings, q05_x=9.9)
    assert full_blob_for(str(tmp_path), {"queries": wrong}) is None
    # ref_scale_* timings print 1-decimal and recur across runs — a tail
    # that only kept those must NOT adopt another run's blob, however
    # many of them match (r18 review)
    ref_only = {f"ref_scale_stage_{i}": 1.5 for i in range(8)}
    from bench import persist_full_blob as _p

    _p(str(tmp_path), {"queries": dict(ref_only), "drift": {"x": 1}})
    assert full_blob_for(str(tmp_path), {"queries": ref_only}) is None


def test_reconstruction_recovers_run_id(tmp_path):
    """The truncated-tail scraper must pick up the run pointer so even a
    head-clipped round can be upgraded to its persisted full blob."""
    tail = (
        '"q54_neardup_clusters": 4.7, "calibration_sec": 0.22, '
        '"bench_method": "min2", "run": "ab12cd34", '
        '"regressions": {}}'
    )
    (tmp_path / "BENCH_r18.json").write_text(json.dumps({"tail": tail}))
    blob = previous_round_bench(str(tmp_path))
    assert blob["run"] == "ab12cd34"
    assert blob["queries"] == {"q54_neardup_clusters": 4.7}


def test_drift_ledger_reopens_for_neardup_family():
    """r18 (VERDICT r17 #6): the near-dup family was scope-fenced in r17
    (tag retirement), so r18 is its first normal comparison — the drift
    channel must pick the family up with the r17 minima as baseline. Uses
    the REAL committed history FENCED TO ROUNDS <= 17: r15/r16 carried
    the retired tags, so only r17 (tag-less, matching the current tag-less
    state) may compare. The fence is what keeps this deterministic — the
    driver drops a new BENCH_r{N}.json after every builder commit, and an
    unfenced read would adopt any faster later round as the binding min
    (the r18 pytest-gate red, VERDICT r18 #1)."""
    import os

    import bench
    from bench import compute_drift, previous_round_benches

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    # read the WHOLE history (not the newest-3 default) so r17/r16 stay
    # in the window no matter how many later rounds the driver records
    hist = [
        b
        for b in previous_round_benches(repo, limit=100)
        if b.get("round", 0) <= 17
    ]
    by_round = {b["round"]: b for b in hist}
    if 17 not in by_round or 16 not in by_round:
        return  # fresh clone without the recorded rounds
    family = (
        "q50_minhash_lsh_neardup",
        "q53_embedding_neardup_pairs",
        "q54_neardup_clusters",
        "q58_sampling_suite",
    )
    r17 = by_round[17]
    # a deliberate 2x slide on each family line must flag vs the r17
    # value: r15/r16 recorded retired scope tags and are fenced out
    now = {q: r17["queries"][q] * 2.0 for q in family}
    flags = compute_drift(
        hist, now, calibration_sec=r17.get("calibration_sec")
    )
    for q in family:
        assert q in flags, f"{q} did not re-enter the drift comparison"
        assert flags[q]["baseline_round"] == 17
        assert flags[q]["baseline"] == r17["queries"][q]


def test_drift_channel_parses_live_history():
    """Integration sanity: the drift channel must parse the REAL committed
    BENCH_r*.json history (driver envelopes, truncated tails and all) —
    shape-only assertions, since the history grows every round."""
    import os

    import bench
    from bench import compute_drift, previous_round_benches

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    hist = previous_round_benches(repo)
    if not hist:  # a fresh clone without recorded rounds
        return
    assert all(isinstance(b.get("queries"), dict) for b in hist)
    rounds = [b["round"] for b in hist]
    assert rounds == sorted(rounds, reverse=True)
    # replaying the newest round's own timings can only flag entries
    # whose history minimum is MORE than 40% below that round — i.e. the
    # channel runs end-to-end on live data without raising
    newest = hist[0]
    flags = compute_drift(
        hist,
        dict(newest["queries"]),
        calibration_sec=newest.get("calibration_sec"),
    )
    # pct prints rounded to 1 decimal, so a rel of 1.4004 lands exactly
    # at 40.0 — >= keeps this live-data assertion flake-free
    for v in flags.values():
        assert v["pct"] >= 40.0


def test_subsecond_noise_floor_in_both_channels():
    """r19 (VERDICT r18 #5 done-criterion): the q01 shape — a ~0.34 s
    line measuring 0.61 s on a jittery session (+82%, +0.28 s) — must NOT
    flag in either channel (session-correlated scheduling/JVM jitter at
    local[32] moves any sub-second line by ±0.2-0.3 s), while second-scale
    lines keep the tight 0.1 s floor and a sub-second line whose absolute
    move clears the noise floor still flags."""
    from bench import compute_drift, compute_regressions

    prev = {"q01": 0.337, "q10": 2.0, "q11": 0.3}
    now = {"q01": 0.613, "q10": 3.0, "q11": 0.8}
    regs = compute_regressions(prev, now)
    # q01: +82% but only +0.276 s on a sub-second baseline -> noise floor
    # q10: second-scale, +50% / +1.0 s -> flags (tight floor unchanged)
    # q11: sub-second but +0.5 s clears the 0.35 s noise floor -> flags
    assert set(regs) == {"q10", "q11"}
    hist = _hist([(18, prev, 0.2, {})])
    flags = compute_drift(hist, now, calibration_sec=0.2, current_tags={})
    assert set(flags) == {"q10", "q11"}


def test_abs_bound_flags_synthetic_trainprep_slide():
    """r19 (VERDICT r18 #3 done-criterion): a synthetic 2x lifecycle
    slide (44 -> ~94 s on a calm host) flags against the absolute bound
    even when the relative channels' baselines slid with it; the
    adjudicated driver-context regime (r18's 93.3 s at mem-cal 0.568 vs
    the bound's 0.406) is relieved by the one-sided mem-ratio
    normalization and does NOT flag."""
    from bench import compute_abs_flags

    # calm host (calibrations at the bound's recorded pair): 2x slides
    flags = compute_abs_flags(
        {"ref_scale_trainprep_sec": 94.0},
        ref_scale_calibration_sec=0.204,
        ref_scale_calibration_mem_sec=0.406,
    )
    assert set(flags) == {"ref_scale_trainprep_sec"}
    assert flags["ref_scale_trainprep_sec"]["bound"] == 88.0
    # the r18 driver-context run's exact shape: raw 93.3 s, CPU cal flat
    # (0.219), mem cal 0.568 -> normalized 93.3/1.399 = 66.7 < 88
    assert compute_abs_flags(
        {"ref_scale_trainprep_sec": 93.3},
        ref_scale_calibration_sec=0.219,
        ref_scale_calibration_mem_sec=0.568,
    ) == {}
    # a REAL 2x slide survives the driver-context relief too
    flags2 = compute_abs_flags(
        {"ref_scale_trainprep_sec": 188.0},
        ref_scale_calibration_sec=0.219,
        ref_scale_calibration_mem_sec=0.568,
    )
    assert set(flags2) == {"ref_scale_trainprep_sec"}
    # builder-range numbers never flag on a calm host
    assert compute_abs_flags(
        {"ref_scale_trainprep_sec": 53.2},
        ref_scale_calibration_sec=0.239,
        ref_scale_calibration_mem_sec=0.398,
    ) == {}
    # a missing entry (replay skipped/failed) flags nothing
    assert compute_abs_flags(
        {}, ref_scale_calibration_sec=0.2,
        ref_scale_calibration_mem_sec=0.4,
    ) == {}
    # a FAST host (ratios < 1) must not tighten the gate: 87 s stays in
    assert compute_abs_flags(
        {"ref_scale_trainprep_sec": 87.0},
        ref_scale_calibration_sec=0.1,
        ref_scale_calibration_mem_sec=0.2,
    ) == {}


def test_trainprep_mem_ratio_normalizes_relative_channels():
    """r19 (VERDICT r18 #2): the driver-context memory-regime premium —
    mem calibration 0.568 vs ~0.40, CPU calibration flat — relieves the
    trainprep line's single-round AND drift comparisons (one-sided), but
    never relieves the fit/ANN lines (their committed driver-run numbers
    sat inside the builder range, so widening would only blunt them)."""
    import bench
    from bench import compute_drift, compute_regressions

    # the r18 pairing: driver-context 93.3 s vs builder run 627a489b's
    # 53.2 s, mem calibrations 0.568 vs 0.398 (ratio 1.427 -> 65.4 s
    # normalized, +23% — under the 25% single-round gate)
    prev2 = {"ref_scale_trainprep_sec": 53.2}
    regs = compute_regressions(
        prev2,
        {"ref_scale_trainprep_sec": 93.3},
        ref_scale_ratio=1.0,
        ref_scale_mem_ratio=0.568 / 0.398,
    )
    assert regs == {}
    # without the mem ratio the same shape flags — the relief is the change
    regs_no_mem = compute_regressions(
        prev2,
        {"ref_scale_trainprep_sec": 93.3},
        ref_scale_ratio=1.0,
    )
    assert set(regs_no_mem) == {"ref_scale_trainprep_sec"}
    # drift channel: per-round mem pairing
    hist = _hist([(18, prev2, 0.23, {})])
    hist[0]["ref_scale_method"] = bench.REF_SCALE_METHOD
    hist[0]["ref_scale_calibration_sec"] = 0.239
    hist[0]["ref_scale_calibration_mem_sec"] = 0.398
    flags = compute_drift(
        hist,
        {"ref_scale_trainprep_sec": 93.3},
        calibration_sec=0.23,
        current_tags={},
        ref_scale_calibration_sec=0.239,
        ref_scale_method=bench.REF_SCALE_METHOD,
        ref_scale_calibration_mem_sec=0.568,
    )
    assert flags == {}
    # same shape WITHOUT the mem scalar: +75% flags (the r18 behavior)
    flags_no_mem = compute_drift(
        hist,
        {"ref_scale_trainprep_sec": 93.3},
        calibration_sec=0.23,
        current_tags={},
        ref_scale_calibration_sec=0.239,
        ref_scale_method=bench.REF_SCALE_METHOD,
    )
    assert set(flags_no_mem) == {"ref_scale_trainprep_sec"}
    # the fit line never rides the mem ratio: a genuine 2x fit slide
    # flags even under a loaded-memory regime
    regs_fit = compute_regressions(
        {"ref_scale_fit_sec": 5.9},
        {"ref_scale_fit_sec": 11.8},
        ref_scale_ratio=1.0,
        ref_scale_mem_ratio=2.0,
    )
    assert set(regs_fit) == {"ref_scale_fit_sec"}


def test_drift_mem_pair_out_of_regime_is_rejected():
    """r20 (ADVICE r19): a corrupted/extreme mem-calibration pairing must
    not silently relieve the drift flag — the pair ratio is fenced by
    the same in-regime bound the CPU replay ratio uses."""
    import bench
    from bench import compute_drift

    prev = {"ref_scale_trainprep_sec": 53.2}
    hist = _hist([(18, prev, 0.23, {})])
    hist[0]["ref_scale_method"] = bench.REF_SCALE_METHOD
    hist[0]["ref_scale_calibration_sec"] = 0.239
    hist[0]["ref_scale_calibration_mem_sec"] = 0.398
    # mem ratio 15.1/0.398 = 38x — far outside the 5x fence; with the
    # fence the +75% slide still flags (CPU ratio flat)
    flags = compute_drift(
        hist,
        {"ref_scale_trainprep_sec": 93.3},
        calibration_sec=0.23,
        current_tags={},
        ref_scale_calibration_sec=0.239,
        ref_scale_method=bench.REF_SCALE_METHOD,
        ref_scale_calibration_mem_sec=15.1,
    )
    assert set(flags) == {"ref_scale_trainprep_sec"}
    # an in-regime pairing (the adjudicated r18 shape) still relieves
    flags_ok = compute_drift(
        hist,
        {"ref_scale_trainprep_sec": 93.3},
        calibration_sec=0.23,
        current_tags={},
        ref_scale_calibration_sec=0.239,
        ref_scale_method=bench.REF_SCALE_METHOD,
        ref_scale_calibration_mem_sec=0.568,
    )
    assert flags_ok == {}


def test_reconstruction_recovers_longdoc_line(tmp_path):
    """r20: the additive longdoc_curate_chunk entry must survive the
    truncated-tail reconstruction like every other non-q bench line."""
    line = json.dumps(
        {"metric": "bench_total_sec", "value": 9.0, "unit": "sec",
         "queries": {"q01": 1.5, "longdoc_curate_chunk": 2.25,
                     "not_a_bench_key": 3.0},
         "sf": 0.1, "calibration_sec": 0.2, "regressions": {}}
    )
    truncated = line[len('{"metric": "bench_total_sec", "va'):]
    (tmp_path / "BENCH_r20.json").write_text(
        json.dumps({"n": 20, "rc": 0, "tail": truncated})
    )
    blob = previous_round_bench(str(tmp_path))
    assert blob["queries"]["longdoc_curate_chunk"] == 2.25
    assert "not_a_bench_key" not in blob["queries"]


def test_compact_line_carries_end_calibration_pair():
    """r20 sweep bracketing: the end-of-sweep probe pair must survive the
    tail window alongside the start pair."""
    from bench import compact_line

    out = {
        "queries": {"q01": 1.0},
        "sf": 0.1,
        "bench_method": "min2",
        "ref_scale_method": "min2_fit_cal_staged",
        "headline_scope": "r20-longdoc",
        "calibration_sec": 0.2,
        "calibration_mem_sec": 0.4,
        "calibration_end_sec": 1.37,
        "calibration_mem_end_sec": 2.9,
        "scope_tags": {},
        "regressions": {},
    }
    slim = json.loads(compact_line(out, {}))
    assert slim["calibration_end_sec"] == 1.37
    assert slim["calibration_mem_end_sec"] == 2.9


def test_longdoc_corpus_shape_and_determinism(spark, sf_dir):
    """r20: the longdoc bench line's corpus is deterministic (two builds
    collect identically), long (docs meaningfully exceed the source
    length), and copy-distinct (curate's exact dedup must keep the
    copies, so the timed region scales with corpus size)."""
    from pyspark.sql import functions as F

    from bench import longdoc_corpus
    from movie_recommendation_etl_spark.sources.catalog import load_table

    docs = load_table(spark, str(sf_dir), "documents").select(
        "doc_id", "text"
    )
    a = longdoc_corpus(docs, group=5, copies=3)
    rows = sorted((r["doc_id"], r["text"]) for r in a.collect())
    rows2 = sorted(
        (r["doc_id"], r["text"])
        for r in longdoc_corpus(docs, group=5, copies=3).collect()
    )
    assert rows == rows2
    n_groups = (
        docs.select((F.col("doc_id") / 5).cast("long")).distinct().count()
    )
    assert len(rows) == n_groups * 3
    # distinct ids, distinct texts (the 3 copy-unique tokens)
    assert len({r[0] for r in rows}) == len(rows)
    assert len({r[1] for r in rows}) == len(rows)
    # long documents: mean token count >= 3x the source mean
    import statistics

    src_mean = statistics.mean(
        len(r["text"].split(" ")) for r in docs.collect()
    )
    long_mean = statistics.mean(len(t.split(" ")) for _, t in rows)
    assert long_mean >= 3 * src_mean
