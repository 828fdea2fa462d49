"""Contention-aware bench admission (round 13).

Round 12's committed bench ran at loadavg 6->15 while the single-core
calibration probe read ~idle — the +13% headline drift was machine
state, not code, and cost a session of adjudication. The fix: an
all-core calibration probe plus an admission gate; a bench recorded at
out-of-band machine state is marked non-comparable at the top level.

Semantics pinned here (learned from the gate's own first live run):
the START check uses loadavg + both calibs; the END check uses only
the calibs, because end-of-run loadavg is dominated by the bench's OWN
just-finished 32-core work (r13 run 1 ended at loadavg 11.8 on an
otherwise idle box) — the live mid-run-contention signal is the
multi-core calib, which reads idle the moment the bench's last query
finishes but stays elevated while a co-tenant is still burning cores.
"""

import json
import os

import bench

IDLE = {
    "cpu_calib_sec": 0.116,
    "cpu_calib_multi_sec": 0.141,
    "cpus": 32,
    "loadavg": [0.1, 0.2, 0.5],
}


def _state(**over):
    s = dict(IDLE)
    s.update(over)
    return s


def test_idle_state_admitted():
    v = bench.admission_verdict(IDLE)
    assert v["admitted"] and v["reasons"] == []


def test_r10_decaying_loadavg_admitted():
    # r10: loadavg 3.36 decaying from a finished job, calib idle —
    # judge-adjudicated comparable. The band must keep admitting it.
    v = bench.admission_verdict(_state(loadavg=[3.36, 4.0, 4.5]))
    assert v["admitted"]


def test_r12_contended_start_refused():
    # r12: loadavg 6.16 at start — the run the gate exists to refuse.
    v = bench.admission_verdict(_state(loadavg=[6.16, 5.0, 3.0]))
    assert not v["admitted"]
    assert any("loadavg1" in r for r in v["reasons"])


def test_multi_calib_deviation_refused_even_at_low_loadavg():
    # The signal single-core calib is blind to: an all-core probe 30%
    # over reference means co-tenants are burning cores right now,
    # whatever loadavg's decaying average says.
    v = bench.admission_verdict(_state(cpu_calib_multi_sec=0.19))
    assert not v["admitted"]
    assert any("multi-core calib" in r for r in v["reasons"])


def test_single_calib_drift_refused():
    v = bench.admission_verdict(_state(cpu_calib_sec=0.140))
    assert not v["admitted"]


def test_multi_calib_within_band_admitted():
    # idle observations on this host class: 0.139-0.143 — all admitted
    for m in (0.139, 0.141, 0.143, 0.152):
        assert bench.admission_verdict(_state(cpu_calib_multi_sec=m))[
            "admitted"
        ], m


def test_end_check_ignores_own_decaying_loadavg():
    """After the last query, loadavg reflects the bench's own finished
    work — high loadavg with IDLE calibs at the end is a clean run."""
    own_load = _state(loadavg=[11.79, 14.09, 9.05])
    assert not bench.admission_verdict(own_load)["admitted"]  # start: refuse
    assert bench.admission_verdict(own_load, end=True)["admitted"]  # end: fine


def test_end_check_catches_mid_run_co_tenant():
    """A co-tenant that arrived mid-run is still burning cores when the
    end probe runs: elevated multi-core calib fails the END check even
    though the start was clean (the r12 scenario)."""
    contended_end = _state(
        loadavg=[15.26, 10.0, 6.0], cpu_calib_multi_sec=0.25
    )
    assert not bench.admission_verdict(contended_end, end=True)["admitted"]
    blk = bench.admission_block(IDLE, contended_end)
    assert blk["start"]["admitted"] and not blk["end"]["admitted"]
    assert blk["comparable"] is False


def test_out_of_band_admission_marks_non_comparable():
    blk = bench.admission_block(_state(cpu_calib_multi_sec=0.5), IDLE)
    assert blk["comparable"] is False
    clean_end = _state(loadavg=[12.0, 10.0, 8.0])  # own work, calibs idle
    assert bench.admission_block(IDLE, clean_end)["comparable"] is True


def test_machine_state_carries_multi_calib():
    st = bench.machine_state()
    assert st["cpu_calib_multi_sec"] > 0
    # all-core contention can only make the shared-resource probe
    # slower than the single-core one, never faster
    assert st["cpu_calib_multi_sec"] >= 0.8 * st["cpu_calib_sec"]


def test_committed_bench_artifact_has_admission_record():
    """The committed BENCH.json must carry the admission block and a
    top-level comparable bit consistent with it — the pin that a
    recorded bench with out-of-band admission is marked non-comparable
    in the artifact round-over-round readers consume."""
    path = os.path.join(os.path.dirname(bench.__file__), "BENCH.json")
    with open(path) as f:
        full = json.load(f)
    adm = full["machine"]["admission"]
    assert full["comparable"] == adm["comparable"]
    assert adm["comparable"] == (
        adm["start"]["admitted"] and adm["end"]["admitted"]
    )
    assert adm["refs"]["cpu_calib_multi_sec"] == bench._CALIB_MULTI_REF_SEC
