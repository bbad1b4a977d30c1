#!/usr/bin/env python3
"""One end-of-round paired bench window: DuckDB full-catalog
median-of-2 (duck_bench), then Spark graft.Bench min-of-two
(reads target/bench-full.json), written as BENCH_PAIRED_<tag>.json.

Usage: python3 tools/paired_window.py <sfDir> <verifyOutDir> <tag>
(Assumes `sbt -batch "runMain graft.Bench"` is runnable from the repo
root and duck_bench.py sits next to this script.)
"""
import json
import re
import subprocess
import sys
from pathlib import Path

def main() -> int:
    sf_dir, out_dir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
    repo = Path(__file__).resolve().parent.parent

    # DuckDB side first (the r10+ pairing order)
    duck = subprocess.run(
        [sys.executable, str(repo / "tools" / "duck_bench.py"),
         sf_dir, out_dir],
        capture_output=True, text=True, check=True)
    duck_times = {}
    for line in duck.stdout.splitlines():
        m = re.match(r"\s*(\S+)\s+([0-9.]+) s\s*$", line)
        if m and not line.lstrip().startswith("=="):
            duck_times[m.group(1)] = float(m.group(2))

    # Spark side in one fresh JVM
    env = dict(SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32")
    import os
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd=repo, env={**os.environ, **env},
                   capture_output=True, text=True, check=True)
    spark_full = json.loads((repo / "target" / "bench-full.json")
                            .read_text())
    spark_times = spark_full["queries"]
    # pair on the queries both sides ran SUCCESSFULLY: a Spark
    # failure (time -1) must drop the query from BOTH sums — keeping
    # DuckDB's time while skipping Spark's would understate the ratio
    # exactly when Spark fails (ADVICE r13) — and be reported.
    both = set(spark_times) & set(duck_times)
    shared = sorted(q for q in both if spark_times[q] >= 0)
    spark_failed = sorted(q for q in both if spark_times[q] < 0)
    spark_total = sum(spark_times[q] for q in shared)
    duck_tot_shared = sum(duck_times[q] for q in shared)
    out = {
        "protocol": ("end-of-round pairing, one host, back-to-back: "
                     "DuckDB full-catalog median-of-2 "
                     "(tools/duck_bench.py), then Spark graft.Bench "
                     "min-of-two in one JVM; identical catalog both "
                     "sides; Spark-failed queries excluded from BOTH "
                     "sums and listed in spark_failed"),
        "spark_total_sec": round(spark_total, 3),
        "duck_total_sec": round(duck_tot_shared, 3),
        "ratio": round(spark_total / duck_tot_shared, 4),
        "n_queries": len(shared),
        "spark_failed": spark_failed,
        "spark": {q: round(spark_times[q], 3) for q in shared},
        "duck": {q: round(duck_times[q], 3) for q in shared},
    }
    dest = repo / f"BENCH_PAIRED_{tag}.json"
    dest.write_text(json.dumps(out, indent=1))
    print(f"[paired] {tag}: spark={spark_total:.1f}s "
          f"duck={duck_tot_shared:.1f}s "
          f"ratio={spark_total / duck_tot_shared:.4f} "
          f"n={len(shared)} -> {dest}")
    return 0

if __name__ == "__main__":
    sys.exit(main())
