#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify into <verifyOutDir>/<name>/ it
runs the matching SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name, and compares values exactly
(with a small report of float max-abs-diff when not exact).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, d))}
    # A query that errored inside graft.Verify writes no dump dir —
    # that must be a failure here, not an invisible skip.
    names = sorted(dumped | set(oracle))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = norm(pd.concat([pd.read_parquet(f) for f in files])) if files else None
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got) if got is not None else 'MISSING'}")
            continue
        try:
            want = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"[FAIL-sql ] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got is None:
            print(f"[FAIL-dump] {name}: no parquet output")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[FAIL-cols] {name}: got {list(got.columns)} want {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL-rows] {name}: got {len(got)} want {len(want)}")
            n_fail += 1
            continue
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
                  if str(got[c].dtype) != str(want[c].dtype)]
        if dt_bad:
            print(f"[FAIL-dtyp] {name}: {dt_bad}")
            n_fail += 1
            continue
        ok = True
        for c in got.columns:
            g, w = got[c], want[c]
            if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
                gv = g.astype(float).to_numpy()
                wv = w.astype(float).to_numpy()
                same = (gv == wv) | (np.isnan(gv) & np.isnan(wv))
                if not same.all():
                    d = np.nanmax(np.abs(gv - wv))
                    print(f"[FAIL-val ] {name}.{c}: {int((~same).sum())} diffs, maxabs={d}")
                    ok = False
            else:
                ga = g.to_numpy()
                wa = w.to_numpy()
                same = pd.Series(ga == wa) | (pd.isna(g).to_numpy() & pd.isna(w).to_numpy())
                if not same.all():
                    i = int(np.argmax(~same.to_numpy()))
                    print(f"[FAIL-val ] {name}.{c}: {int((~same).sum())} diffs, "
                          f"first at row {i}: got={ga[i]!r} want={wa[i]!r}")
                    ok = False
        if ok:
            print(f"[PASS     ] {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} dumped")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
