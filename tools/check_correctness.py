#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (columns sorted by name,
rows sorted, values canonicalized). Dev tool only — the shipped library has
no Python dependency.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>
"""
import sys, json, glob, math
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return "b:" + str(v).lower()
    if isinstance(v, Decimal):
        return "d:" + str(v.normalize())
    if isinstance(v, float):
        return "f:" + repr(v)
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, pd.Timestamp):
        return "t:" + v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return "s:" + str(v)


def canon_df(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple(canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return list(df.columns), rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        verify_errors = json.load(open(f"{out_dir}/verify_errors.json"))
    except Exception:
        verify_errors = {}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            # surface Verify's own error record instead of a bare
            # "no output" — the r7 failures were invisible without this
            err = verify_errors.get(name, "no spark output")
            print(f"FAIL {name}: {err}")
            n_fail += 1
            continue
        try:
            mine = pd.concat([pd.read_parquet(f) for f in files])
            ref = con.execute(oracle[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        mc, mr = canon_df(mine)
        rc, rr = canon_df(ref)
        if mc != rc:
            print(f"FAIL {name}: columns {mc} vs oracle {rc}")
            n_fail += 1
        elif mr != rr:
            n_fail += 1
            print(f"FAIL {name}: rows {len(mr)} vs {len(rr)}")
            for i, (a, b) in enumerate(zip(mr, rr)):
                if a != b:
                    print(f"  first diff at sorted row {i}:\n    mine   {a}\n    oracle {b}")
                    break
            else:
                if len(mr) != len(rr):
                    longer, which = (mr, "mine") if len(mr) > len(rr) else (rr, "oracle")
                    print(f"  extra row in {which}: {longer[min(len(mr), len(rr))]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(mr)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
