"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": ..., "value": <total query sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "throughput": {"n_rows": ..., "levels": {"local[8]": {...},
    "local[32]": {...}}, "scaling_efficiency": ...}}

Two parts:

1. Per-query wall time for every ``queries()`` entry at
   ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
   ``local[$SPARK_GRAFT_CPUS]`` — each query is forced with a
   count-of-collected-plan (``df.write.format("noop")``) so the whole
   plan executes without driver-side materialization cost.

2. North-rule throughput: sustained sequences/sec through the windowed
   temporal-aggregation streaming pipeline (readStream parquet ->
   watermark -> tumbling window hash-agg -> exactly-once foreachBatch
   sink), run at N and 4N cores in separate subprocesses (fresh JVM per
   level so parallelism is honest), reporting scaling efficiency
   thr(4N) / (4 * thr(N)) — the sandbox stand-in for N vs 4N executors
   (BASELINE.json north_rule).

Usage:
  python bench.py                 # full run, one JSON line on stdout
  python bench.py --quick         # skip the scaling sweep (dev loop)
  python bench.py --worker local[8] <input_dir> <n_rows>  # internal
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "4000000"))
SMALL_CPUS = max(CPUS // 4, 1)


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> int:
    """Execute the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    times: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        _force(fn(spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)
    return times


# ----------------------------------------------------------------------
# throughput worker (runs in its own process per parallelism level)
# ----------------------------------------------------------------------
def worker(master: str, input_dir: str, n_rows: int) -> None:
    from kaskada_spark.session import get_spark
    from kaskada_spark.streaming.pipeline import run_token_pipeline

    spark = get_spark(app_name=f"bench-{master}", master=master)
    work = tempfile.mkdtemp(prefix="bench_worker_")
    try:
        t0 = time.time()
        run_token_pipeline(
            spark,
            input_dir,
            out_dir=os.path.join(work, "out"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            window="1 minute",
            watermark="2 minutes",
            available_now=True,
        )
        elapsed = time.time() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"master": master, "sec": round(elapsed, 3),
                      "seq_per_sec": round(n_rows / elapsed, 1)}))


def _spawn_worker(master: str, input_dir: str, n_rows: int) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", master, input_dir, str(n_rows)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench worker {master} failed:\n{out.stderr[-4000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def scaling_sweep(spark, n_rows: int) -> dict:
    """Generate a deterministic token-stream parquet once, then run the
    streaming pipeline at small and large core counts in fresh JVMs."""
    from kaskada_spark.sources.tokens import synthesize_token_stream

    input_dir = tempfile.mkdtemp(prefix="bench_input_")
    try:
        synthesize_token_stream(
            spark, n_rows, avg_tokens=64, hot_key_fraction=0.02, partitions=CPUS * 4
        ).write.mode("overwrite").parquet(input_dir)

        levels = {}
        for cores in (SMALL_CPUS, CPUS):
            master = f"local[{cores}]"
            levels[master] = _spawn_worker(master, input_dir, n_rows)
        small = levels[f"local[{SMALL_CPUS}]"]["seq_per_sec"]
        large = levels[f"local[{CPUS}]"]["seq_per_sec"]
        eff = large / (small * (CPUS / SMALL_CPUS)) if small else 0.0
        return {
            "n_rows": n_rows,
            "levels": levels,
            "scaling_efficiency": round(eff, 3),
            "note": f"thr(local[{CPUS}]) / ({CPUS // SMALL_CPUS} * thr(local[{SMALL_CPUS}]))",
        }
    finally:
        shutil.rmtree(input_dir, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    quick = "--quick" in sys.argv

    from kaskada_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    times = run_queries(spark)
    result = {
        "metric": "kaskada_spark query suite + windowed token-stream throughput",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": _sf_of(SF_DIR),
    }
    if not quick:
        result["throughput"] = scaling_sweep(spark, BENCH_ROWS)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
