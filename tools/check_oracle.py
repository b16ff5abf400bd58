#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library has no Python dependency).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet under <outDir>, runs the corresponding
oracle SQL from oracle_sql.json in DuckDB over the same parquet tables,
sorts columns by name, and compares row-by-row with exact equality.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # row order: both sides declare ORDER BY, but normalize anyway
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracles:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            n_noracle += 1
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                ok = (a.isna() & b.isna()) | (a == b)
                # exact match required — compare as objects if dtypes differ
                if not ok.all():
                    bad.append((c, int((~ok).sum()), a[~ok].iloc[0], b[~ok].iloc[0]))
            except Exception:
                av, bv = a.astype(str), b.astype(str)
                ok = av == bv
                if not ok.all():
                    bad.append((c, int((~ok).sum()), av[~ok].iloc[0], bv[~ok].iloc[0]))
            # dtype sanity note (driver may hash dtype-sensitively)
            if str(a.dtype) != str(b.dtype):
                print(f"  note {name}.{c}: dtype {a.dtype} vs {b.dtype}")
        if bad:
            print(f"FAIL {name}: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
