"""TPU perf-regression tests (SURVEY.md section 4 item 5; VERDICT r1 #3).

The correctness suite pins numerics on fake CPU devices (conftest.py
forces the cpu backend in-process), so these tests time the BASELINE
workloads on the REAL chip in a clean subprocess and fail if any drops
below its recorded floor (benchmarks/floors.json — 0.85x the last
recorded numbers, slack for tunnel noise). A deliberate 2x slowdown in
any hot op fails the suite on the chip.

Skipped when the chip is unreachable, when the subprocess lands on a
non-TPU backend, or with MIES_TPU_PERF=0 (e.g. for fast local loops).
Every successful run appends to benchmarks/bench_history.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
FLOORS = json.loads((ROOT / "benchmarks" / "floors.json").read_text())

pytestmark = pytest.mark.skipif(
    os.environ.get("MIES_TPU_PERF", "1") == "0",
    reason="perf-regression tests disabled via MIES_TPU_PERF=0",
)


@pytest.fixture(scope="module")
def workload_results():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    try:
        # full iteration counts — the --quick slope (4 iters) is dominated
        # by tunnel-RTT noise and produced floors-breaking garbage numbers
        out = subprocess.run(
            [sys.executable, str(ROOT / "benchmarks" / "workloads.py")],
            # 1500 s: at 900 a slow-tunnel night (r5 session 2) timed
            # the sweep out and silently skipped all 18 workload
            # gates; the sweep itself is ~8 min on a healthy tunnel
            capture_output=True, text=True, timeout=1500, env=env,
            cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU workload run timed out (cold compile or no chip)")
    rows = []
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            rows.append(json.loads(line))
    if out.returncode != 0 or not rows:
        pytest.skip(f"TPU unavailable: {out.stderr.strip()[-300:]}")
    if any(r.get("backend") not in (None, "tpu") for r in rows):
        pytest.skip("workloads ran on a non-TPU backend; floors are chip numbers")
    results = {r["workload"]: r for r in rows}
    with open(ROOT / "benchmarks" / "bench_history.jsonl", "a") as f:
        f.write(json.dumps({"ts": time.time(), "results": results}) + "\n")
    return results


@pytest.mark.parametrize(
    "name",
    sorted(n for n in FLOORS if n.startswith("w") and not n.endswith("_device")),
)
def test_workload_throughput_floor(workload_results, name):
    r = workload_results.get(name)
    if r is None:
        pytest.skip(f"workload {name} not reported")
    got = r["slices_per_sec"]
    floor = FLOORS[name]
    assert got >= floor, (
        f"{name} regressed: {got:.0f} slices/s < floor {floor:.0f} "
        f"(floors.json = 0.85x last recorded; update it only with a "
        f"justified trade-off)"
    )


@pytest.mark.parametrize(
    "name", sorted(n[: -len("_device")] for n in FLOORS if n.endswith("_device"))
)
def test_device_throughput_floor(workload_results, name):
    """Per-call numbers swing with tunnel dispatch jitter (w1 recorded
    5.0-7.9k, w3 7.2k-34k run to run); the DEVICE-side fori_loop number
    is the stable framework-attributable gate (VERDICT r2 weak #1
    honest-gate requirement), so every float workload gates on it."""
    r = workload_results.get(name)
    if r is None or "device_slices_per_sec" not in r:
        pytest.skip(f"{name} device-loop number not reported")
    floor = FLOORS[f"{name}_device"]
    got = r["device_slices_per_sec"]
    assert got >= floor, (
        f"{name} device-side throughput regressed: {got:.0f} < {floor}"
    )


def test_latency_ceiling(workload_results):
    r = workload_results.get("latency_b1_clahe_denoise_512")
    if r is None:
        pytest.skip("latency workload not reported")
    ceil = FLOORS["latency_b1_clahe_denoise_512_p50_ms_max"]
    assert r["p50_ms"] <= ceil, (
        f"batch-1 latency regressed: p50 {r['p50_ms']:.2f} ms > {ceil} ms"
    )


def test_latency_device_tail_ceiling(workload_results):
    """The DEVICE-side p95 (fori_loop program, no per-call dispatch) is
    the framework-attributable tail; the per-call p95 (0.5-1.6 ms across
    runs vs device 0.098) is tunnel/host dispatch and is deliberately
    ungated (VERDICT r2 weak #4 attribution)."""
    r = workload_results.get("latency_b1_clahe_denoise_512")
    if r is None or "device_p95_ms" not in r:
        pytest.skip("device-loop latency not reported")
    ceil = FLOORS["latency_b1_clahe_denoise_512_device_p95_ms_max"]
    assert r["device_p95_ms"] <= ceil, (
        f"device-side latency tail regressed: p95 "
        f"{r['device_p95_ms']:.3f} ms > {ceil} ms"
    )


@pytest.fixture(scope="module")
def census_results():
    """Chip run of the slowest-op census subset (the ops floor-gated as
    census_<op> in floors.json). The full 100-op sweep is a manual/
    round-end job (benchmarks/op_census.py --write); this fixture
    re-times ONLY the gated ops so the perf suite stays bounded."""
    gated = sorted(
        n[len("census_"):] for n in FLOORS if n.startswith("census_")
    )
    if not gated:
        pytest.skip("no census floors recorded yet")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    try:
        out = subprocess.run(
            [sys.executable, str(ROOT / "benchmarks" / "op_census.py"),
             "--only", ",".join(gated), "--quick"],
            capture_output=True, text=True, timeout=2400, env=env, cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("census run timed out (cold compile or no chip)")
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    if not rows:
        pytest.skip(f"census unavailable: {out.stderr.strip()[-300:]}")
    if any(r.get("backend") != "tpu" for r in rows):
        pytest.skip("census ran on a non-TPU backend; floors are chip numbers")
    return {r["op"]: r for r in rows}


@pytest.mark.parametrize(
    "name", sorted(n for n in FLOORS if n.startswith("census_"))
)
def test_op_census_floor(census_results, name):
    """VERDICT r3 item 1c: the slowest registry ops get chip floors —
    the class of op that hid 100x losses (493 ms 3-D CLAHE, 911 ms band
    CLAHE) until first measured."""
    op = name[len("census_"):]
    r = census_results.get(op)
    if r is None or "error" in r:
        pytest.fail(f"census op {op} unmeasurable: {r}")
    got = r["slices_per_sec"]
    assert got >= FLOORS[name], (
        f"census op {op} regressed: {got:.0f} slices/s < floor "
        f"{FLOORS[name]} (0.85x the recorded census run)"
    )
