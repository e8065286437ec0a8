#!/usr/bin/env python3
"""DEV-ONLY harness (not part of the engine): replicate the driver's
DuckDB-oracle comparison locally so oracle SQL can be validated before a
round ends. Usage: python3 scripts/oracle_check.py <sfdir> <verify_outdir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sfdir: str, outdir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name} (caller-listed: DuckDB-side replay cost)")
            n_skip += 1
            continue
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
            want = con.sql(sql).df()
            g, w = normalize(got), normalize(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1
                continue
            if g.shape != w.shape:
                print(f"FAIL {name}: shape {g.shape} vs {w.shape}")
                n_fail += 1
                continue
            if not g.equals(w):
                neq = (g != w) & ~(g.isna() & w.isna())
                bad = neq.any(axis=0)
                badcols = list(bad[bad].index)
                print(f"FAIL {name}: value mismatch in {badcols}")
                for c in badcols[:2]:
                    rows = neq[c][neq[c]].index[:3]
                    for r in rows:
                        print(f"   [{r}] {c}: got={g[c][r]!r} want={w[c][r]!r}")
                n_fail += 1
                continue
            dg = dict(g.dtypes.astype(str))
            dw = dict(w.dtypes.astype(str))
            flag = "" if dg == dw else f"  (dtypes differ: {dg} vs {dw})"
            print(f"PASS {name} rows={len(g)}{flag}")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail" +
          (f" / {n_skip} skipped" if n_skip else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
