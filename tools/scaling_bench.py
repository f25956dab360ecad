"""North-rule scaling evidence: the same frontier-scheduling job at two
parallelism levels (default local[2] vs local[8] — the sandbox stand-in
for N vs 4N executors), fresh JVM each, identical input.

No real cluster exists here, and the box's 32 "CPUs" are SMT-shared with
turbo asymmetry: a PURE-CPU embarrassingly-parallel Spark job (sha2 over
range, zero shuffle, zero Python) measures at only ~0.68 efficiency for
2→8 cores and ~0.54 for 8→32 — that is the HARDWARE ceiling, not a
property of any job. So this harness calibrates: it runs that pure-CPU
job at both levels too, and reports raw efficiency, the machine ceiling,
and efficiency normalized to the ceiling (the share of achievable scaling
the frontier job actually achieves — the quantity a real 4× cluster would
see). Prints one JSON line; results belong in BASELINE.md's BENCH section.

Env: SCALING_N / SCALING_4N (level pair), SCALING_RUNS (best-of-k),
BENCH_CANDIDATE_MULT (input size; same at both levels)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CALIB = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from crawler_ai_spark.session import get_spark
cores = {cores}
spark = get_spark(cores=cores)
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, 120_000_000, 1, cores * 4)
expr = F.sum(F.conv(F.sha2(F.col("id").cast("string"), 256).substr(1, 8), 16, 10).cast("long"))
df.select(expr).collect()  # warm
t0 = time.perf_counter()
df.select(expr).collect()
print("CALIB", time.perf_counter() - t0)
spark.stop()
"""


def run_calibration(cores: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _CALIB.format(repo=REPO, cores=cores)],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("CALIB")][-1]
    return float(line.split()[1])


def run_level(cores: int, runs: int = 2) -> dict:
    best = None
    for _ in range(runs):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), BENCH_QUERIES="0")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)["frontier"]
        if best is None or r["sec"] < best["sec"]:
            best = r
    return best


def main():
    runs = int(os.environ.get("SCALING_RUNS", "2"))
    lo = int(os.environ.get("SCALING_N", "2"))
    hi = int(os.environ.get("SCALING_4N", str(lo * 4)))
    r_lo = run_level(lo, runs)
    r_hi = run_level(hi, runs)
    c_lo = run_calibration(lo)
    c_hi = run_calibration(hi)
    eff = (r_hi["urls_per_sec"] / r_lo["urls_per_sec"]) / (hi / lo)
    ceiling = (c_lo / c_hi) / (hi / lo)
    print(json.dumps({
        "n_cores": lo, "four_n_cores": hi,
        f"t{lo}": r_lo["sec"], f"t{hi}": r_hi["sec"],
        f"urls_per_sec_{lo}": r_lo["urls_per_sec"],
        f"urls_per_sec_{hi}": r_hi["urls_per_sec"],
        "n_candidates": r_lo["n_candidates"],
        "scaling_efficiency_raw": round(eff, 3),
        f"machine_ceiling_purecpu_t{lo}": round(c_lo, 2),
        f"machine_ceiling_purecpu_t{hi}": round(c_hi, 2),
        "machine_ceiling_efficiency": round(ceiling, 3),
        "scaling_efficiency_normalized": round(eff / ceiling, 3),
        "runs_per_level": runs,
    }))


if __name__ == "__main__":
    main()
