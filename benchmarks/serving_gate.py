"""Scripted serving SLO gate (VERDICT r3 #5): kernels have tpu_gate,
serving gets this.

Runs the end-to-end HTTP serving bench (bench_serving.py — native C++
front-end, binary wire, the recorded conc-256 x pipeline-16 operating
point on the 1M x 384 f16 corpus) in a subprocess and asserts the
measured q/s, p50, p99 and error rate against budgets, appending a
pass/fail verdict to results.jsonl so serving regressions have a scripted
place to show up between rounds.

Budgets (VERDICT r4 #6 — tightened from 4000/1500 to measured-minus-
documented-variance; the recorded operating point is 10.1-11.4k q/s,
p50 ~350-390 ms at 4096 outstanding, BASELINE.md serving ladder):

    qps    >= 7000      (recorded 10.1k; the documented degraded-phase
                         floor is ~0.6x = 6.1k measured 2026-08-18, so a
                         single in-phase run can still miss — see retry)
    p50    <= 600 ms    (recorded ~390 ms; p50 ~ outstanding/qps)
    p99    <= 2500 ms
    errors <= 0.5% of completed requests

Tunnel weather vs regression: degraded phases last minutes-to-hours
(CLAUDE.md), so a failing run is re-tried once after a 120 s spacing —
a real regression fails BOTH runs; a phase edge usually clears one. The
verdict row records every attempt.

Exit 0 = all SLOs held on some attempt. Run: python benchmarks/
serving_gate.py (chip-lock aware through the bench subprocess; queues
behind other benchmarks).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results.jsonl")

BUDGETS = {
    "qps_min": 7000.0,
    "p50_ms_max": 600.0,
    "p99_ms_max": 2500.0,
    "error_rate_max": 0.005,
}
RETRY_SPACING_S = 120.0  # one re-run rides out a tunnel phase edge


def emit(record: dict):
    record["bench"] = "serving_gate"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def run_once(attempt: int) -> bool:
    cmd = [
        sys.executable, os.path.join(HERE, "bench_serving.py"),
        "--server", "native", "--mode", "binary", "--accept-binary",
        "--concurrency", "256", "--pipeline", "16",
        "--max-batch", "2048",  # the recorded row's flush depth (~2024)
        "--seconds", "15", "--port", "8923",
    ]
    print("running:", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3000)
    rec = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if row.get("concurrency") == 256 and "qps" in row:
            rec = row
    if rec is None:
        emit({"gate": "slo_conc256_pl16", "ok": False, "attempt": attempt,
              "error": "no result row from bench_serving",
              "tail": proc.stdout[-500:] + proc.stderr[-300:]})
        return False

    completed = rec["qps"] * 15.0
    error_rate = rec.get("errors", 0) / max(1.0, completed)
    checks = {
        "qps": rec["qps"] >= BUDGETS["qps_min"],
        "p50": rec["p50_ms"] <= BUDGETS["p50_ms_max"],
        "p99": rec.get("p99_ms", 0) <= BUDGETS["p99_ms_max"],
        "errors": error_rate <= BUDGETS["error_rate_max"],
    }
    ok = all(checks.values())
    emit({
        "gate": "slo_conc256_pl16", "ok": ok, "attempt": attempt,
        "qps": rec["qps"], "p50_ms": rec["p50_ms"],
        "p99_ms": rec.get("p99_ms"), "errors": rec.get("errors", 0),
        "error_rate": round(error_rate, 5),
        "failed": [k for k, v in checks.items() if not v],
        "budgets": BUDGETS,
    })
    # HTTP-vs-loopback gap decomposition (VERDICT r4 #6): the native server
    # keeps per-flush accounting, so the serving wall splits into engine
    # time (the loopback-equivalent term), batcher idle (client supply /
    # flush scheduling), and everything else (wire parse, response
    # serialization, queue handoff). Whichever term dominates is the next
    # serving lever — or the documented client-side residual.
    if rec.get("flushes"):
        seconds = 15.0
        wall_ms_per_flush = seconds * 1e3 / rec["flushes"]
        engine_frac = rec["engine_ms_per_flush"] / wall_ms_per_flush
        idle_frac = rec.get("worker_idle_s", 0.0) / seconds
        emit({
            "gate": "slo_gap_decomposition", "attempt": attempt,
            "flushes": rec["flushes"], "mean_flush": rec.get("mean_flush"),
            "wall_ms_per_flush": round(wall_ms_per_flush, 2),
            "engine_ms_per_flush": rec["engine_ms_per_flush"],
            "engine_frac": round(engine_frac, 3),
            "idle_frac": round(idle_frac, 3),
            "other_frac": round(max(0.0, 1 - engine_frac - idle_frac), 3),
        })
    return ok


def main() -> int:
    for attempt in (1, 2):
        if run_once(attempt):
            return 0
        if attempt == 1:
            print(f"attempt 1 failed; re-running after {RETRY_SPACING_S}s "
                  "(tunnel phase spacing)", flush=True)
            time.sleep(RETRY_SPACING_S)
    return 1


if __name__ == "__main__":
    sys.exit(main())
