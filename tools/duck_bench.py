#!/usr/bin/env python3
"""Per-query DuckDB oracle timing — the local counterpart of graft.Bench.

Usage:
    python3 tools/duck_bench.py <sfDir> <verifyOutDir> [queryName ...]

<verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
Registers the sf parquet tables as DuckDB views, times each oracle SQL
(median of `--passes`, default 2), prints one line per query and a
total — so Spark-vs-oracle comparisons can be made per query on the
same host, the same way the judge measures.
"""
import json
import statistics
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
PASSES = 2


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    only = set(sys.argv[3:])

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    con.execute(f"SET threads TO {32}")
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    times = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        samples = []
        try:
            for _ in range(PASSES):
                t0 = time.perf_counter()
                con.execute(oracle[name]).fetchall()
                samples.append(time.perf_counter() - t0)
            times[name] = statistics.median(samples)
            print(f"{name:35s} {times[name]:8.3f} s")
        except Exception as e:  # mirror Bench's -1 sentinel
            times[name] = -1.0
            print(f"{name:35s}   FAILED  {type(e).__name__}: {e}")
    ok = {k: v for k, v in times.items() if v >= 0}
    print(f"== total {sum(ok.values()):.3f} s over {len(ok)} queries "
          f"({len(times) - len(ok)} failed) ==")
    return 0 if len(ok) == len(times) else 1


if __name__ == "__main__":
    sys.exit(main())
