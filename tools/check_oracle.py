#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query dumped
by graft.Verify, run its DuckDB oracle SQL on the same sf dir and
compare canonicalized results (columns sorted by name, rows sorted by
all columns, exact value equality).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # Sort key: numeric columns sort numerically (with -0.0 folded to
    # +0.0 so both engines align), everything else as strings — a
    # stable total order shared by the spark and duck frames.
    key = pd.DataFrame(index=df.index)
    for c in df.columns:
        if df[c].dtype.kind in "fiu":
            key[c] = df[c].astype(float) + 0.0
        else:
            key[c] = df[c].astype(str)
    order = key.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last").index
    return df.loc[order].reset_index(drop=True)


def compare(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        print(f"FAIL {name}: column mismatch spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return False
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rowcount spark={len(spark_df)} duck={len(duck_df)}")
        return False
    a, b = canon(spark_df), canon(duck_df)
    bad_cols = []
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes str(value), so an int column on one side and
        # float on the other ("99111" vs "99111.0") hash-mismatches even
        # when numerically equal (DuckDB integer sum() -> HUGEINT ->
        # pandas float64 is the usual culprit; cast ::BIGINT in the
        # oracle). Flag it here so the local gate is as strict.
        if (av.dtype.kind in "iu") != (bv.dtype.kind in "iu") and \
                av.dtype.kind in "fiu" and bv.dtype.kind in "fiu":
            bad_cols.append(
                f"{c}(dtype skew: spark={av.dtype} duck={bv.dtype} — "
                f"driver str-hash would mismatch)")
            continue
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float); bv = bv.astype(float)
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                mx = np.nanmax(np.abs(av - bv))
                bad_cols.append(f"{c}(maxdiff={mx!r}, n={int((~eq).sum())})")
        else:
            eq = (av.astype(str) == bv.astype(str))
            if not eq.all():
                i = int(np.argmax(~eq.values))
                bad_cols.append(f"{c}(n={int((~eq).sum())}, first: spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r})")
    if bad_cols:
        print(f"FAIL {name}: value mismatch {', '.join(bad_cols)}")
        return False
    print(f"PASS {name} ({len(spark_df)} rows)")
    return True


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = compare(name, spark_df, duck_df)
        n_pass += ok
        n_fail += (not ok)
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
