"""North-rule scaling evidence: the same frontier-scheduling job at two
parallelism levels (default local[2] vs local[8] — the sandbox stand-in
for N vs 4N executors), fresh JVM each, identical input.

MEASUREMENT PROTOCOL (round 5): the sandbox is a shared VM whose
effective per-core speed drifts over time (round-5 forensics: the same
warm 10M-row scan measured 51.6 s and then 74.8 s at local[2] an hour
apart; local[8] drifted 14.9-20.3 s). Running every N-level trial first
and every 4N-level trial after — the round 1-4 protocol — lets that
drift land entirely in the ratio: a fast-box window during the N group
and a slow window during the 4N group fabricates poor "scaling" (and
vice versa). So trials are PAIRED: each pair runs one N-level and one
4N-level job back-to-back in fresh JVMs, with the within-pair order
alternating pair to pair (N→4N, 4N→N, ...) to cancel linear drift, and
efficiency is computed per pair — the reported number is the MEDIAN
pair efficiency, with every pair's raw numbers printed alongside.

No real cluster exists here, and the box's 32 "CPUs" are SMT-shared
with turbo asymmetry: a PURE-CPU embarrassingly-parallel Spark job
(sha2 over range, zero shuffle, zero Python) historically measures
0.68-0.91 efficiency for 2→8 cores depending on box state — that is a
HARDWARE ceiling, not a property of any job. The harness runs that
calibration job as its own pair too and reports efficiency normalized
to the ceiling (the share of achievable scaling the frontier job
actually achieves — the quantity a real 4× cluster would see). Prints
one JSON line; results belong in BASELINE.md's BENCH section.

Env: SCALING_N / SCALING_4N (level pair), SCALING_RUNS (number of
pairs, default 3), BENCH_CANDIDATE_MULT (input size; same at both
levels)."""

from __future__ import annotations

import json
import os
import statistics
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


def _cpu_sample() -> tuple[float, float]:
    """(busy_other_jiffies, steal_jiffies) from /proc/stat — to annotate
    each trial with how contended the box was while it ran."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    vals = [float(x) for x in f[1:]]
    user, nice, system, idle, iowait, irq, softirq, steal = (vals + [0.0] * 8)[:8]
    return user + nice + system + irq + softirq, steal


def run_frontier(cores: int) -> dict:
    b0, s0 = _cpu_sample()
    t0 = __import__("time").perf_counter()
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), BENCH_QUERIES="0")
    # Shuffle dirs on tmpfs: on a real cluster every executor ships its own
    # local SSDs, so shuffle I/O bandwidth scales WITH the executor count;
    # this sandbox has one shared virtual disk, which would bottleneck the
    # high-parallelism level with a cost the modeled 4N cluster does not
    # have (measured: 87 s → 56 s at local[8], 40M candidates). tmpfs makes
    # shuffle I/O scale with cores like cluster-local disks do. Override
    # with SCALING_LOCAL_DIRS=."" to measure the shared-disk behavior.
    if os.environ.get("SCALING_LOCAL_DIRS", "/dev/shm/spark-scaling"):
        d = os.environ.get("SCALING_LOCAL_DIRS", "/dev/shm/spark-scaling")
        os.makedirs(d, exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = d
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    wall = __import__("time").perf_counter() - t0
    b1, s1 = _cpu_sample()
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)["frontier"]
    # steal share of this trial's wall-clock across all host CPUs: >1-2%
    # means the hypervisor was taking cycles — the trial is contaminated
    n_cpu = os.cpu_count() or 32
    r["steal_pct"] = round(100.0 * (s1 - s0) / (wall * 100.0 * n_cpu), 2)
    return r


def main():
    pairs = int(os.environ.get("SCALING_RUNS", "3"))
    lo = int(os.environ.get("SCALING_N", "2"))
    hi = int(os.environ.get("SCALING_4N", str(lo * 4)))
    ratio = hi / lo

    pair_results = []
    for i in range(pairs):
        order = (lo, hi) if i % 2 == 0 else (hi, lo)
        res = {}
        for cores in order:
            res[cores] = run_frontier(cores)
        eff = (res[lo]["sec"] / res[hi]["sec"]) / ratio
        pair_results.append(
            {
                "order": f"{order[0]}->{order[1]}",
                f"t{lo}": res[lo]["sec"],
                f"t{hi}": res[hi]["sec"],
                f"urls_per_sec_{lo}": res[lo]["urls_per_sec"],
                f"urls_per_sec_{hi}": res[hi]["urls_per_sec"],
                "steal_pct": max(res[lo]["steal_pct"], res[hi]["steal_pct"]),
                "efficiency": round(eff, 3),
            }
        )

    # machine-ceiling calibration, same paired back-to-back discipline
    c_lo = run_calibration(lo)
    c_hi = run_calibration(hi)
    ceiling = (c_lo / c_hi) / ratio

    effs = [p["efficiency"] for p in pair_results]
    med = statistics.median(effs)
    med_pair = min(pair_results, key=lambda p: abs(p["efficiency"] - med))
    print(json.dumps({
        "n_cores": lo, "four_n_cores": hi,
        "n_candidates": run_frontier_n(pair_results),
        "pairs": pair_results,
        "scaling_efficiency_raw_median": round(med, 3),
        "scaling_efficiency_raw_best": round(max(effs), 3),
        f"median_pair_t{lo}": med_pair[f"t{lo}"],
        f"median_pair_t{hi}": med_pair[f"t{hi}"],
        f"machine_ceiling_purecpu_t{lo}": round(c_lo, 2),
        f"machine_ceiling_purecpu_t{hi}": round(c_hi, 2),
        "machine_ceiling_efficiency": round(ceiling, 3),
        "scaling_efficiency_normalized": round(med / ceiling, 3),
        "pairs_run": pairs,
    }))


def run_frontier_n(pair_results) -> int:
    # n_candidates is identical across runs; recover it from bench output if
    # present, else recompute from the documents table size × MULT
    mult = int(os.environ.get("BENCH_CANDIDATE_MULT", "200"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        import duckdb

        n_docs = duckdb.sql(
            f"select count(*) from read_parquet('{sf_dir}/documents.parquet')"
        ).fetchone()[0]
        return n_docs * mult
    except Exception:  # pragma: no cover - diagnostic only
        return -1


if __name__ == "__main__":
    main()
