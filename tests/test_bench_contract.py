"""Bench machine-line contract tests (round-5 fixes, VERDICT r4 #1/#2).

The driver stores only a 2,000-char tail of bench output and parses the
LAST line. Rounds 2 and 4 both lost their bench record because the compact
line silently outgrew that buffer. These tests pin the budget at build
time, and pin the contention sentinel that separates "box was loaded"
from "operator regressed".
"""

from __future__ import annotations

import json
import multiprocessing
import statistics
import time

import bench


def _worst_case_tp() -> dict[str, dict[str, float]]:
    # 9.999M rec/s is above every lane's ceiling (fastest observed: 7.9M).
    return {
        k: {"rec_per_sec": 9_999_000.0, "spread": 0.99, "cal_ms": [999.9, 999.9]}
        for k in bench.LANES
    }


def _worst_case_walls() -> dict[str, float]:
    # 99.99 s per query is ~25x the slowest wall ever recorded (3.9 s).
    return {k: 99.99 for k in bench.BENCH_QUERIES}


def test_compact_line_fits_tail_buffer_at_worst_case():
    line = bench.compact_line(
        total=9999.99,
        per_query=_worst_case_walls(),
        tp=_worst_case_tp(),
        sf=0.1,
        load=[99.99, 99.99],
        cal=[999.9, 999.9, 999.9, 999.9],
        # worst case: EVERY lane flagged at a 2-digit deviation
        flags={k: 99.99 for k in bench.LANES},
        # worst-case steal fields: 100.0 is steal_pct's true maximum
        # (one char wider than 99.9 — ADVICE r10), steal_bad at the
        # full lane count
        steal=100.0,
        steal_bad=len(bench.BENCH_QUERIES) + len(bench.LANES),
    )
    assert len(line) < 1950
    parsed = json.loads(line)
    # The driver contract: metric/value/unit/queries/sf all present.
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["unit"] == "sec"
    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
    assert parsed["sf"] == 0.1
    # Sentinel fields present.
    assert len(parsed["load"]) == 2
    assert len(parsed["cal_ms"]) == 4
    assert parsed["contended"] in (0, 1)
    # session-ambient marker present even at worst case (r7, VERDICT r6 #6)
    assert parsed["ambient"] in (0, 1)
    # rec_k covers every lane under its shortened key.
    assert len(parsed["rec_k"]) == len(bench.LANES)


def test_ambient_flag_thresholds():
    """VERDICT r6 #6: separate 'whole run was loaded' (discount the lane
    flags) from 'this lane's reading is wrong'. Idle 32-core box reads
    < 1 at start; every recorded contended run started > 3; gate at 2.0.
    START reading only — the end reading always carries the bench's own
    self-load (r5 ended at 24.11, an idle r7 run at 15.73)."""
    assert bench.ambient_flag([0.4, 0.9]) == 0
    assert bench.ambient_flag([5.7, 19.36]) == 1  # the r6 run's shape
    assert bench.ambient_flag([0.36, 15.73]) == 0  # idle start, self-loaded end
    assert bench.ambient_flag([2.0, 2.0]) == 0  # gate is strict
    assert bench.ambient_flag([]) == 0  # degenerate input
    # marker lands in the compact line next to lane_flags
    line = bench.compact_line(
        1.0,
        {"q1_pricing_summary": 1.0},
        {"url_filter_1m": {"rec_per_sec": 1000.0, "cal_ms": [50.0, 50.0]}},
        0.1,
        load=[5.7, 3.1],
        cal=[50.0, 50.0],
    )
    assert json.loads(line)["ambient"] == 1


def test_compact_line_overflow_fails_loudly():
    # Growth past the budget must raise at build/test time, never reach the
    # driver as a silently-truncated tail.
    bloated = {f"q_{i}_some_longer_query_name_here": 99.99 for i in range(200)}
    try:
        bench.compact_line(1.0, bloated, _worst_case_tp(), 0.1, [1, 1], [50] * 4)
    except RuntimeError as e:
        # RuntimeError, not assert: python -O strips asserts (ADVICE r5)
        assert "1950" in str(e)
    else:
        raise AssertionError("oversized compact line did not raise")


def test_short_lane_keys_are_unique_and_reversible_by_eye():
    shorts = [bench._short_lane(k) for k in bench.LANES]
    assert len(set(shorts)) == len(shorts)
    assert bench._short_lane("url_filter_1m") == "url_filter"
    assert bench._short_lane("image_metadata_100k") == "image_metadata"
    assert bench._short_lane("quality_clf_1m_md5_oracle") == "quality_clf_md5"


def test_contention_flag_thresholds():
    dev, flagged = bench.contention_flag([50.0, 50.0, 50.0, 50.0])
    assert dev == 0.0 and not flagged
    # r4 shape: one lane group ran while the box was loaded — kernel 2.4x.
    dev, flagged = bench.contention_flag([50.0, 50.0, 120.0, 50.0])
    assert flagged and dev == 1.4
    # Boundary: 60% is the gate (resident-JVM self-noise measures 0.31-0.46
    # and can't be sampled away; real events measure >= 2.0). Just under
    # stays clean.
    _, flagged = bench.contention_flag([50.0, 79.0])
    assert not flagged
    _, flagged = bench.contention_flag([50.0, 81.0])
    assert flagged
    # The measured self-noise band must NOT trip (the r5 false-positive).
    _, flagged = bench.contention_flag([34.0, 45.0, 43.0, 39.0])
    assert not flagged
    # Degenerate inputs never divide by zero.
    assert bench.contention_flag([]) == (0.0, False)
    assert bench.contention_flag([0.0, 50.0]) == (0.0, False)


def _spin(stop_t: float) -> None:
    x = 1
    while time.time() < stop_t:
        x = (x * 1103515245 + 12345) % (1 << 31)


class _FakeDF:
    """Stands in for a DataFrame in lane-timer tests: count() returns a
    fixed row count after a tiny sleep (so the triple has nonzero walls)."""

    def count(self) -> int:
        time.sleep(0.02)
        return 1000


def test_per_lane_sentinel_flags_only_the_loaded_lane():
    """VERDICT r5 #2 acceptance: synthetic load injected during ONE lane's
    measurement must flag that lane and no others. The load spans the
    whole measure() call (both bracket readings) and is fully torn down
    before the next lane runs."""
    bench.calibration_ms()  # allocate/warm the kernel array outside timing
    out: dict[str, dict[str, float]] = {}
    measure = bench._measure_into(out, 1000)

    measure("url_filter_1m", _FakeDF())

    ncpu = multiprocessing.cpu_count()
    stop_t = time.time() + 30.0  # upper bound; terminated explicitly below
    procs = [
        multiprocessing.Process(target=_spin, args=(stop_t,))
        for _ in range(ncpu * 2)
    ]
    for p in procs:
        p.start()
    try:
        time.sleep(0.5)  # let the load ramp before the bracket reading
        measure("exact_dedup_1m", _FakeDF())
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join()
    time.sleep(0.3)  # let the box settle before the clean lane

    measure("token_count_1m", _FakeDF())

    flags = bench.lane_flags(out)
    assert "exact_dedup_1m" in flags, f"loaded lane not flagged: {out}"
    assert set(flags) == {"exact_dedup_1m"}, f"clean lanes flagged: {flags}"
    # every lane carries its bracket readings + annotated deviation
    for name in ("url_filter_1m", "exact_dedup_1m", "token_count_1m"):
        assert len(out[name]["cal_ms"]) == 2
        assert "cal_dev" in out[name]


def test_lane_flags_degenerate_inputs():
    assert bench.lane_flags({}) == {}
    assert bench.lane_flags({"url_filter_1m": {"rec_per_sec": 1.0}}) == {}
    assert bench.lane_flags({"url_filter_1m": {"cal_ms": [0.0, 50.0]}}) == {}
    # uniform readings: no flags, dev annotated as 0
    tp = {
        "url_filter_1m": {"cal_ms": [50.0, 50.0]},
        "exact_dedup_1m": {"cal_ms": [50.0, 50.0]},
    }
    assert bench.lane_flags(tp) == {}
    assert tp["url_filter_1m"]["cal_dev"] == 0.0
    # one lane 2.4x the session base: only it flags
    tp = {
        "url_filter_1m": {"cal_ms": [50.0, 52.0]},
        "exact_dedup_1m": {"cal_ms": [120.0, 118.0]},
    }
    assert set(bench.lane_flags(tp)) == {"exact_dedup_1m"}


def test_calibration_kernel_flags_synthetic_load():
    """End-to-end sentinel check: the fixed kernel re-timed under a burst of
    CPU-saturating processes must deviate enough to trip the 60% gate
    (this is exactly the r4 failure the sentinel exists to catch)."""
    # Idle baseline: median of 3 to shake scheduler noise.
    bench.calibration_ms()  # touch/allocate the array outside timing
    idle = statistics.median(bench.calibration_ms() for _ in range(3))
    # Saturate every core (2x oversubscription) long enough to cover one
    # full min-of-3 checkpoint (~1s of sleeps + kernels).
    ncpu = multiprocessing.cpu_count()
    stop_t = time.time() + 6.0
    procs = [multiprocessing.Process(target=_spin, args=(stop_t,)) for _ in range(ncpu * 2)]
    for p in procs:
        p.start()
    try:
        time.sleep(0.5)  # let the load ramp
        loaded = bench.calibration_ms()
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join()
    _, flagged = bench.contention_flag([idle, loaded])
    assert flagged, f"idle {idle:.1f}ms vs loaded {loaded:.1f}ms did not trip the gate"


def test_should_refuse_contended_ritual():
    """VERDICT r8 #3: a contended bench exits nonzero unless overridden —
    decision pinned here (main() wires it to sys.exit(3))."""
    clean_cal = [40.0, 41.0, 42.0, 40.5]       # dev ~0.05 — idle
    loaded_cal = [40.0, 140.0, 42.0, 40.5]     # dev 2.5 — contended
    idle_load = [0.3, 18.0]                    # end reading is self-load
    hot_load = [26.5, 30.0]                    # r8 driver-run shape

    assert not bench.should_refuse_contended(clean_cal, idle_load, env={})
    assert bench.should_refuse_contended(loaded_cal, idle_load, env={})
    assert bench.should_refuse_contended(clean_cal, hot_load, env={})
    # both override spellings (bench-local and the probe's) are honored
    assert not bench.should_refuse_contended(
        loaded_cal, hot_load, env={"SPARK_GRAFT_BENCH_ALLOW_CONTENDED": "1"}
    )
    assert not bench.should_refuse_contended(
        loaded_cal, hot_load, env={"SPARK_GRAFT_PROBE_ALLOW_CONTENDED": "1"}
    )


def test_allow_contended_zero_means_no():
    """Code review r9: ALLOW_CONTENDED=0 must KEEP the gate, not drop it."""
    loaded_cal = [40.0, 140.0, 42.0, 40.5]
    hot_load = [26.5, 30.0]
    assert bench.should_refuse_contended(
        loaded_cal, hot_load, env={"SPARK_GRAFT_BENCH_ALLOW_CONTENDED": "0"}
    )
    assert bench.should_refuse_contended(
        loaded_cal, hot_load, env={"SPARK_GRAFT_PROBE_ALLOW_CONTENDED": "false"}
    )
    assert not bench.should_refuse_contended(
        loaded_cal, hot_load, env={"SPARK_GRAFT_PROBE_ALLOW_CONTENDED": "yes"}
    )


def test_headline_extra_run_gate():
    """r10 best-of-N policy: a third pass fires only when the first two
    walls disagree by more than HEADLINE_REL_GATE of their minimum."""
    assert not bench.headline_extra_run(1.00, 1.10)   # 10% — agree
    assert not bench.headline_extra_run(1.10, 1.00)   # order-free
    assert bench.headline_extra_run(1.00, 1.30)       # 30% — disagree
    assert bench.headline_extra_run(2.60, 2.00)       # burst in pass 1
    # exact gate boundary is NOT over the gate (strict >)
    assert not bench.headline_extra_run(1.00, 1.20)
    # degenerate walls never trigger a third pass
    assert not bench.headline_extra_run(0.0, 5.0)
    assert not bench.headline_extra_run(-1.0, 1.0)


def test_steal_sentinel():
    """r10 session 2: hypervisor-steal sentinel. One otherwise-idle run
    recorded three lanes at 10-30x in-band walls while cal_dev read 0.36
    and start loadavg 0.31 — host-level contention is invisible to both
    existing sentinels, steal ticks are its only guest-visible trace."""
    # arithmetic: 50 stolen of 1000 elapsed ticks = 5%
    assert bench.steal_pct((100, 10_000), (150, 11_000)) == 5.0
    # degenerate inputs: missing snapshots, non-advancing clock,
    # counter-reset (negative delta clamps to 0)
    assert bench.steal_pct(None, (150, 11_000)) == 0.0
    assert bench.steal_pct((100, 10_000), None) == 0.0
    assert bench.steal_pct((100, 10_000), (100, 10_000)) == 0.0
    assert bench.steal_pct((100, 10_000), (50, 11_000)) == 0.0
    # live snapshot parses on this platform and is monotone; on non-Linux
    # platforms steal_snapshot is documented to return None — skip the
    # live assertions there (ADVICE r10), keep the arithmetic ones above
    a = bench.steal_snapshot()
    if a is None:
        import pytest

        pytest.skip("steal_snapshot unreadable on this platform")
    assert a[1] > 0 and 0 <= a[0] <= a[1]
    b = bench.steal_snapshot()
    assert b[1] >= a[1] and b[0] >= a[0]
    # the field lands in the compact line and stays inside the budget
    # (steal=100.0 is the true worst case — one char wider than 99.9)
    line = bench.compact_line(
        total=9999.99,
        per_query=_worst_case_walls(),
        tp=_worst_case_tp(),
        sf=0.1,
        load=[99.99, 99.99],
        cal=[999.9, 999.9, 999.9, 999.9],
        flags={k: 99.99 for k in bench.LANES},
        steal=100.0,
    )
    assert len(line) < 1950
    assert json.loads(line)["steal_pct"] == 100.0
    # default keeps older callers' lines parseable with the field present
    line = bench.compact_line(1.0, {"q1_pricing_summary": 1.0}, {}, 0.1, [1, 1], [50] * 4)
    assert json.loads(line)["steal_pct"] == 0.0
    assert json.loads(line)["steal_bad"] == 0


def test_should_refuse_bench_severe_only():
    """r10 ritual (VERDICT r9 task 5): with best-of-N minima, moderate
    contention RECORDS (flags in the compact line defend it); only severe
    sustained load — cal_dev >= 2.0 or start loadavg >= 8 — refuses."""
    clean_cal = [40.0, 41.0, 42.0, 40.5]        # dev ~0.05
    moderate_cal = [40.0, 67.0, 42.0, 40.5]     # dev ~0.68 — the r9 shape
    severe_cal = [40.0, 140.0, 42.0, 40.5]      # dev 2.5 — true event band
    idle_load = [0.3, 18.0]
    warm_load = [1.71, 23.28]                   # the r9 driver session
    cata_load = [8.1, 30.0]                     # the r4 catastrophic start

    assert not bench.should_refuse_bench(clean_cal, idle_load, env={})
    # the r9 driver session (cal_dev 0.69, load 1.71) now RECORDS
    assert not bench.should_refuse_bench(moderate_cal, warm_load, env={})
    assert bench.should_refuse_bench(severe_cal, idle_load, env={})
    assert bench.should_refuse_bench(clean_cal, cata_load, env={})
    # overrides still honored, and =0 still means no
    assert not bench.should_refuse_bench(
        severe_cal, cata_load, env={"SPARK_GRAFT_BENCH_ALLOW_CONTENDED": "1"}
    )
    assert bench.should_refuse_bench(
        severe_cal, cata_load, env={"SPARK_GRAFT_BENCH_ALLOW_CONTENDED": "0"}
    )
    # the probe ritual is unchanged: moderate contention still refuses there
    assert bench.should_refuse_contended(moderate_cal, idle_load, env={})


def test_steal_all_tainted_gate():
    """r11 retry/flag condition: a lane is steal-dirty only when EVERY
    pass ran under >= STEAL_PASS_GATE percent hypervisor steal."""
    assert bench.steal_all_tainted([2.3, 1.5, 4.0])
    assert not bench.steal_all_tainted([2.3, 0.0, 4.0])  # one clean pass
    assert not bench.steal_all_tainted([0.0, 0.0])
    assert not bench.steal_all_tainted([])  # no signal => never tainted
    # gate is >=, so exactly-at-gate passes count as tainted
    assert bench.steal_all_tainted([bench.STEAL_PASS_GATE])


def test_should_refuse_bench_steal_ritual():
    """r11 (VERDICT r10 task 1): run-wide steal past STEAL_REFUSE_PCT with
    lanes that never found a steal-clean pass refuses; high steal with
    every lane clean still records (minima demonstrably untainted); dirty
    lanes under the run-wide gate record with the steal_bad flag."""
    clean_cal = [40.0, 41.0, 42.0, 40.5]
    idle_load = [0.3, 18.0]
    # the r10 driver session's shape: 5.7% run-wide steal — refuses ONLY
    # when lanes stayed dirty after the retry ladder
    assert bench.should_refuse_bench(
        clean_cal, idle_load, env={}, steal=5.7, steal_bad=3
    )
    assert not bench.should_refuse_bench(
        clean_cal, idle_load, env={}, steal=5.7, steal_bad=0
    )
    # dirty lanes under the run-wide gate: record (flag defends the lanes)
    assert not bench.should_refuse_bench(
        clean_cal, idle_load, env={}, steal=1.2, steal_bad=3
    )
    # boundary: gate is >=
    assert bench.should_refuse_bench(
        clean_cal, idle_load, env={}, steal=bench.STEAL_REFUSE_PCT, steal_bad=1
    )
    # override honored, and =0 still means no
    assert not bench.should_refuse_bench(
        clean_cal, idle_load, steal=9.0, steal_bad=9,
        env={"SPARK_GRAFT_BENCH_ALLOW_CONTENDED": "1"},
    )
    assert bench.should_refuse_bench(
        clean_cal, idle_load, steal=9.0, steal_bad=9,
        env={"SPARK_GRAFT_BENCH_ALLOW_CONTENDED": "0"},
    )
