"""Scripted serving SLO gate (VERDICT r3 #5): kernels have tpu_gate,
serving gets this.

Runs the end-to-end HTTP serving bench (bench_serving.py — native C++
front-end, binary wire, the recorded conc-256 x pipeline-16 operating
point on the 1M x 384 f16 corpus) in a subprocess and asserts the
measured q/s, p50, p99 and error rate against budgets, appending a
pass/fail verdict to results.jsonl so serving regressions have a scripted
place to show up between rounds.

Budgets are set WIDE of the recorded numbers (BASELINE.md serving ladder:
10.1k q/s, p50 388 ms at 4096 outstanding) because the tunnel has
hour-scale 0.6x degraded phases (CLAUDE.md) — the gate must catch real
regressions (an eager-dispatch path, an error storm, a dead batcher), not
platform weather:

    qps    >= 4000      (recorded 10.1k; 0.4x would still pass weather)
    p50    <= 1500 ms   (p50 ~ outstanding/qps; 4096/4000 ~ 1.0 s)
    p99    <= 5000 ms
    errors <= 0.5% of completed requests

Exit 0 = all SLOs held. Run: python benchmarks/serving_gate.py
(chip-lock aware through the bench subprocess; queues behind other
benchmarks).
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
    "qps_min": 4000.0,
    "p50_ms_max": 1500.0,
    "p99_ms_max": 5000.0,
    "error_rate_max": 0.005,
}


def emit(record: dict):
    record["bench"] = "serving_gate"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main() -> int:
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
        emit({"gate": "slo_conc256_pl16", "ok": False,
              "error": "no result row from bench_serving",
              "tail": proc.stdout[-500:] + proc.stderr[-300:]})
        return 1

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
        "gate": "slo_conc256_pl16", "ok": ok,
        "qps": rec["qps"], "p50_ms": rec["p50_ms"],
        "p99_ms": rec.get("p99_ms"), "errors": rec.get("errors", 0),
        "error_rate": round(error_rate, 5),
        "failed": [k for k, v in checks.items() if not v],
        "budgets": BUDGETS,
    })
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
