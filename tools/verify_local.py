"""Local mirror of the driver's correctness gate: run every queries()
entry against its oracle_sql() on DuckDB and report match status.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import __spark_entry__ as entry_mod
from oracle_util import compare
from kaskada_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="verify-local", master="local[8]", shuffle_partitions=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                compare(df, oracles[name], sf_dir)
                status = "MATCH"
            else:
                n = df.count()
                status = f"ROWS-ONLY ({n} rows)"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
            failed.append(name)
            if "-v" in sys.argv:
                traceback.print_exc()
        print(f"{name:24s} {time.time()-t0:6.1f}s  {status}")
    spark.stop()
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nALL OK")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
