"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR.

Prints the headline JSON line
  {"metric": "total_runtime", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": "<dir>"}
followed by ONE SHORT LINE PER QUERY ({"query": name, "sec": t}) and a
final short summary line.  Rationale: the driver may keep only the head
or tail of stdout — round 3 lost the total to head truncation, round 4
lost the per-query map the same way.  The tail now carries the full
information in lines short enough that any truncation window keeps
them; the last line is always a self-contained parseable total.

Each query is fully materialized via the noop sink (no driver collect —
measures the distributed plan, not result transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stedi_human_balance_redis_kafka_spark_streaming_spark.plans import registry
from stedi_human_balance_redis_kafka_spark_streaming_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Hermetic buildcache (r18): every bench invocation must compute from the
# parquet inputs alone — a warm cross-process disk tier (a previous bench
# or test run left artifacts under spark-warehouse/buildcache keyed on the
# same corpus fingerprints) would let the FIRST run of a cache-backed
# query skip its build and understate the build cost the methodology
# means to amortize (min-of-N already reports the within-invocation warm
# steady state, which is the documented contract).  Point the tier at a
# fresh per-invocation directory unless the caller explicitly pinned one.
if "SPARK_GRAFT_BUILDCACHE_DIR" not in os.environ:
    import atexit
    import shutil
    import tempfile

    _bench_cache_dir = tempfile.mkdtemp(prefix="stedi-bench-buildcache-")
    os.environ["SPARK_GRAFT_BUILDCACHE_DIR"] = _bench_cache_dir
    # The dir is ours (freshly created above, never a caller-pinned
    # path): remove it on exit so repeated bench runs don't leak /tmp
    # directories holding sf-sized parquet artifacts (ADVICE r18).
    atexit.register(shutil.rmtree, _bench_cache_dir, ignore_errors=True)


RUNS_PER_QUERY = 2

# If the two samples of a query disagree by more than this ratio, run it
# once more and keep the min.  Replaces a hard-coded name set (r07
# nit): session-position wobble (cleanup I/O + GC from a preceding
# heavy query) roams between queries as the registry evolves, so the
# trigger must be the observed spread, not a frozen list.
WOBBLE_RATIO = 1.5

# Recycle the SparkSession every N queries.  A single 90+-query session
# accrues a uniform ~1.4× slowdown on its later queries (measured
# r03→r04 on unchanged plans: block-manager population, lingering
# localCheckpoint RDDs from the iterative CC/BPE queries, heap
# fragmentation feeding longer GC cycles) that per-query clearCache +
# System.gc() does not reclaim.  A fresh session resets the block
# manager and drops dead RDD/broadcast registries for ~3-5 s of restart
# cost per recycle; driver-side build caches (operators/buildcache) are
# plain Python rows and survive recycles by design.
SESSION_RECYCLE_EVERY = 24


def _fresh_session():
    # Periodic-GC timer raised to 30min: the per-query explicit GC below
    # already keeps the ContextCleaner fed, and the 5-minute timer would
    # otherwise fire a concurrent cycle mid-bench that lands its cost on
    # whichever query happens to be running.
    spark = get_spark(
        app_name="stedi-bench",
        extra_conf={
            "spark.cleaner.periodicGC.interval": "30min",
            # The console progress bar writes carriage-return frames to
            # stderr that glue themselves onto the per-query "# name:"
            # lines (r07: 27 of 126 lines lost their line start in the
            # captured log) — keep the timing log greppable.
            "spark.ui.showConsoleProgress": "false",
        },
    )
    # JVM/codegen warmup on a trivial action so the first timed query
    # doesn't absorb session startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def _env_fingerprint(spark) -> dict:
    """Machine/JVM fingerprint for the BENCH json header (VERDICT r10
    #6): cross-round comparisons need to separate machine drift (the
    uniform ~1.1× r09→r10 shift on untouched queries) from plan drift.
    Everything here is cheap to read and stable within one run."""
    import multiprocessing
    import platform

    sc = spark.sparkContext
    jvm = sc._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    fp = {
        "python": platform.python_version(),
        "spark": spark.version,
        "java": str(jvm.System.getProperty("java.version")),
        "max_heap_mb": int(rt.maxMemory() // (1024 * 1024)),
        "jvm_cpus": int(rt.availableProcessors()),
        "os_cpus": multiprocessing.cpu_count(),
        "load_1m": round(os.getloadavg()[0], 2),
        "master": sc.master,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    # container caps (cgroup v2): "max" = unbounded; absent file = not
    # containerized / cgroup v1 — omit rather than guess
    for key, path in (
        ("cgroup_cpu_max", "/sys/fs/cgroup/cpu.max"),
        ("cgroup_mem_max", "/sys/fs/cgroup/memory.max"),
    ):
        try:
            with open(path) as f:
                fp[key] = f.read().strip()
        except OSError:
            pass
    # Calibration probes: two FIXED workloads whose plans never change
    # across rounds, so their cross-round ratio measures the MACHINE
    # (JVM codegen + CPU for one, parquet scan + page cache for the
    # other), not the engine.  vs-prev divides the common-set ratio by
    # the cpu-probe ratio to separate plan drift from machine drift.
    # MEDIAN of 3 runs, not min of 2 (VERDICT r14 #5): the r14
    # final-tree log's single-shot-ish probe drifted 0.28→0.18 s
    # between same-day runs and INVERTED the normalized line; the
    # median absorbs one outlier sample in either direction.
    fp["calib_cpu_s"] = round(
        sorted(_calib_cpu(spark) for _ in range(3))[1], 3
    )
    fp["calib_scan_s"] = round(
        sorted(_calib_scan(spark) for _ in range(3))[1], 3
    )
    return fp


def _calib_cpu(spark) -> float:
    t0 = time.perf_counter()
    spark.range(100_000_000).selectExpr(
        "sum(id * 2654435761 % 1000000007)"
    ).collect()
    return time.perf_counter() - t0


def _calib_scan(spark) -> float:
    t0 = time.perf_counter()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).selectExpr(
        "sum(l_extendedprice)", "count(*)"
    ).collect()
    return time.perf_counter() - t0


def _prev_log_text() -> str:
    """The PREVIOUS committed bench log — read from git HEAD first, so
    the usual `2>bench_stderr.log` redirect (which truncates the
    working-tree file before Python starts) cannot erase the baseline
    mid-run; falls back to the working-tree file."""
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    try:
        txt = subprocess.run(
            ["git", "-C", root, "show", "HEAD:bench_stderr.log"],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout
    except Exception:
        txt = ""
    if not txt:
        try:
            with open(os.path.join(root, "bench_stderr.log")) as f:
                txt = f.read()
        except OSError:
            return ""
    return txt


def _prev_timings(txt: str) -> dict[str, float]:
    """Per-query timings parsed from a bench log's '# name: Xs' lines."""
    import re

    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r"^# (\S+): ([0-9.]+)s$", txt, re.M)
    }


def _prev_env(txt: str) -> dict:
    """The '# env: {...}' fingerprint of a previous bench log, {} if
    the log predates the fingerprint block (r10 and earlier)."""
    import re

    m = re.search(r"^# env: (\{.*\})$", txt, re.M)
    if not m:
        return {}
    try:
        return json.loads(m.group(1))
    except ValueError:
        return {}


def _report_vs_prev(timings: dict[str, float], env: dict) -> None:
    """Cross-round drift attribution (VERDICT r09 'what's wrong' #3):
    after the run, print the common-set total ratio vs the previous
    committed log plus every >=1.2x / <=0.8x per-query mover — so an
    unchanged-code drift is visible AS drift (session pressure) and an
    isolated regression points at its query.  When both logs carry
    calibration probes, also print the MACHINE-NORMALIZED ratio
    (common-set ratio ÷ cpu-probe ratio): ~1.0x there means the raw
    movement is the box, not the plans.  Stderr-only: the stdout JSON
    contract is unchanged."""
    txt = _prev_log_text()
    prev = _prev_timings(txt)
    common = [n for n in timings if n in prev]
    if not common:
        print("# vs-prev: no previous log found", file=sys.stderr, flush=True)
        return
    cur_t = sum(timings[n] for n in common)
    prev_t = sum(prev[n] for n in common)
    ratio = cur_t / prev_t
    print(
        f"# vs-prev common-set total: {cur_t:.1f}s / {prev_t:.1f}s = "
        f"{ratio:.3f}x over {len(common)} queries "
        f"(uniform shifts = machine drift; compare the '# env:' "
        f"fingerprint lines of the two logs)",
        file=sys.stderr,
        flush=True,
    )
    penv = _prev_env(txt)
    if penv.get("calib_cpu_s") and env.get("calib_cpu_s"):
        mach = env["calib_cpu_s"] / penv["calib_cpu_s"]
        print(
            f"# vs-prev machine-normalized: {ratio / mach:.3f}x "
            f"(cpu probe {penv['calib_cpu_s']:.2f}s -> "
            f"{env['calib_cpu_s']:.2f}s = {mach:.3f}x machine; scan "
            f"probe {penv.get('calib_scan_s', float('nan')):.2f}s -> "
            f"{env.get('calib_scan_s', float('nan')):.2f}s)",
            file=sys.stderr,
            flush=True,
        )
    movers = [
        (timings[n] / prev[n], n)
        for n in common
        if prev[n] >= 0.2  # sub-200ms baselines are pure noise
        and (timings[n] >= 1.2 * prev[n] or timings[n] <= 0.8 * prev[n])
    ]
    for ratio, n in sorted(movers, reverse=True)[:20]:
        print(
            f"# vs-prev mover {n}: prev {prev[n]:.2f}s cur "
            f"{timings[n]:.2f}s ratio {ratio:.2f}",
            file=sys.stderr,
            flush=True,
        )


def main() -> None:
    spark = _fresh_session()
    env = _env_fingerprint(spark)
    # stderr copy so the committed bench_stderr.log carries the
    # fingerprint next to the per-query lines the movers table reads
    print(f"# env: {json.dumps(env)}", file=sys.stderr, flush=True)

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        # Drop operator-local caches so queries are timed independently
        # (leaked cached frames + pinned broadcasts degrade later
        # queries), and force a GC cycle so the ContextCleaner reclaims
        # dead shuffles/broadcasts between measurements (round-1: a
        # 32-query run degraded late queries ~8× without this).
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        return elapsed

    timings: dict[str, float] = {}
    for i, (name, fn) in enumerate(sorted(registry.queries().items())):
        if i > 0 and i % SESSION_RECYCLE_EVERY == 0:
            spark.stop()
            spark = _fresh_session()
        # Steady-state timing: min of N runs.  Cleanup I/O (ContextCleaner
        # deleting the previous heavy query's shuffle files) is bursty and
        # lands on whichever query is running — observed as a roaming
        # 20-80 s spike that moves between runs.  The min is the query's
        # actual plan cost.
        samples = [run_once(fn) for _ in range(RUNS_PER_QUERY)]
        if max(samples) > WOBBLE_RATIO * min(samples):
            samples.append(run_once(fn))
        timings[name] = round(min(samples), 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)

    _report_vs_prev(timings, env)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "env": env,
            }
        ),
        flush=True,
    )
    # Truncation-proof per-query record: one short line per query, all
    # near the tail of stdout.  Sorted by ASCENDING sec so the heaviest
    # queries — the ones a perf review actually needs — sit LAST,
    # immediately before the final summary line.  The r07 artifact
    # settled how the driver captures stdout: it keeps the TAIL, so
    # heaviest-last is the only ordering that survives truncation
    # (r05/r06 lost heavy timings to alphabetical order; r07 lost them
    # again to descending-first).
    for name in sorted(timings, key=lambda n: (timings[n], n)):
        print(json.dumps({"query": name, "sec": timings[name]}), flush=True)
    # Short self-contained summary LAST so the official artifact always
    # ends with a parseable total whatever the capture window.
    print(
        json.dumps(
            {
                "metric": "total_runtime",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": SF_DIR,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
