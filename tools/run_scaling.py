"""Scaling-efficiency evidence for the north rule.

Runs bench.py at two parallelism levels (default local[8] vs local[32] — the
sandbox stand-in for N vs 4N executors on identical input) and writes
BENCH/BASELINE.md with throughput at each level and the scaling efficiency
  eff = (thr_4N / thr_N) / 4.

Usage: python tools/run_scaling.py [low_cpus high_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(cpus: int) -> dict:
    # single rep per bench invocation: THIS script's interleaved
    # median-of-reps across legs is the de-noising layer here; bench.py's
    # internal reps would triple each leg's wall time for no extra signal
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        GMX_BENCH_REPS="1",
        GMX_BENCH_REPS_HEAVY="1",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    factor = high / low

    # The sandbox host carries a variable external load; a single run per
    # leg can land on a load spike and misstate either side.  Interleave
    # GMX_SCALING_REPS runs per leg and take each leg's MEDIAN run (best-of-N
    # would bias the pass/fail gate toward passing under noise, since the two
    # minima need not come from comparable load windows); the full
    # distribution is printed so the spread is visible.
    reps = int(os.environ.get("GMX_SCALING_REPS", "3"))
    split_size = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")
    runs_low, runs_high = [], []
    for _ in range(reps):
        runs_low.append(run_bench(low))
        runs_high.append(run_bench(high))

    def median_run(runs: list[dict]) -> dict:
        ordered = sorted(runs, key=lambda r: r["value"])
        return ordered[(len(ordered) - 1) // 2]  # lower-middle for even N

    r_low = median_run(runs_low)
    r_high = median_run(runs_high)
    dist_low = [round(r["value"], 1) for r in runs_low]
    dist_high = [round(r["value"], 1) for r in runs_high]

    thr_low = r_low["docs"] / r_low["value"]
    thr_high = r_high["docs"] / r_high["value"]
    eff = (thr_high / thr_low) / factor
    ex_low = r_low["docs"] / r_low["queries"]["extract"]
    ex_high = r_high["docs"] / r_high["queries"]["extract"]
    ex_eff = (ex_high / ex_low) / factor

    rows = "\n".join(
        f"| {q} | {r_low['queries'][q]:.1f} | {r_high['queries'][q]:.1f} |"
        for q in r_low["queries"]
    )
    md = f"""# BENCH/BASELINE — measured throughput + scaling efficiency

Generated {date.today()} by `tools/run_scaling.py` (same input, same code,
two parallelism levels — the sandbox evidence for the north rule's N vs 4N
executor scaling gate; no real cluster is available here).

Input: `{os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")}`,
corpus scale x{r_low.get("scale")} = {r_low["docs"]} documents.

Measured scope (what the timed pipeline actually covers): scan of the
PRE-MATERIALIZED span-corpus parquet (synthesis is untimed scaffolding — in
production the corpus is an existing Iceberg table) -> text reassembly ->
dispatch -> Arrow extraction PRUNED to the bounding_box property (the
spatial pipeline consumes nothing else; the projection pushdown also prunes
the catalog join out of the plan) -> bucketed cell + centroid INDEX BUILD
(timed, in the headline) -> bbox-overlap / PIP / kNN / tile joins SERVED
FROM THE INDEX (gmx.geometry.bucketed: the per-query covering shuffle is
paid once at the build; the joins read the index side with no Exchange).
Auxiliary dedup/ANN queries are timed separately and excluded from the
headline.  NOTE: round-0 numbers timed synthesis + full-property extraction
+ catalog join, and rounds 1-3 timed on-the-fly (unindexed) joins, so
round-over-round throughput deltas across those boundaries partly reflect
changed measured scope, not pure engine speedup — compare within a round's
scope only.

| metric | local[{low}] (N) | local[{high}] ({factor:.0f}N) |
|---|---|---|
| pipeline wall time (s) | {r_low["value"]:.1f} | {r_high["value"]:.1f} |
| pipeline throughput (docs/s) | {thr_low:.0f} | {thr_high:.0f} |
| extraction throughput (docs/s) | {ex_low:.0f} | {ex_high:.0f} |

**Scaling efficiency (pipeline): {eff:.2f}** — gate: >= 0.8 at 4x cores.
**Scaling efficiency (extraction stage): {ex_eff:.2f}**

Per-query wall seconds:

| query | local[{low}] | local[{high}] |
|---|---|---|
{rows}

Caveats: single-JVM local mode shares one driver and page cache, so the
{factor:.0f}x core step under-rewards shuffle-heavy stages relative to a
real {factor:.0f}x-executor cluster; per-run JIT/Python-worker warm-up is
included in both columns (same bias both sides).  Both legs read the
identical materialized corpus (fixed 64-file layout; split size
{split_size} — scan tasks >= cores at either level).  Efficiency slightly
above 1 is possible: fixed driver/JIT/scheduling overheads amortize better
at higher parallelism, and the shared sandbox host carries external load
noise; the honest claim is "no parallelism bottleneck up to
{factor:.0f}N", not super-linearity.  Each leg is the MEDIAN of {reps}
interleaved runs (equal noise exposure both sides); pipeline wall-time
distributions: local[{low}] {dist_low} s, local[{high}] {dist_high} s.

Parallelism-level choice: the driver instruction permits any N vs 4N core
pair.  On this shared 32-CPU host the single-JVM local mode imposes a
ceiling (one driver, one heap, shared memory bandwidth) and the host shows
bursty hypervisor CPU steal (measured up to 35% for ~2-minute windows), so
the honest pair is one where BOTH legs are underprovisioned relative to
free capacity AND long enough that a steal burst cannot dominate a leg.
The full measured ladder for this round is recorded below the caveats when
present.
"""
    (REPO / "BENCH" / "BASELINE.md").write_text(md)
    print(json.dumps({
        "low_cpus": low, "high_cpus": high,
        "thr_low": round(thr_low, 1), "thr_high": round(thr_high, 1),
        "efficiency": round(eff, 3), "extract_efficiency": round(ex_eff, 3),
        "dist_low_sec": dist_low, "dist_high_sec": dist_high,
    }))


if __name__ == "__main__":
    main()
