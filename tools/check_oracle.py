#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with every testdata table
registered as a view, and compares: row count, sorted column names, and a
hash over values with columns sorted by name and rows sorted canonically.
"""
import json
import sys
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    # The driver sorts RAW values (pandas sort_values), which throws
    # "unhashable type: numpy.ndarray" on array cells — so array-typed
    # output columns are a gate failure there. Replicate that here
    # instead of quietly stringifying them (round-1 lesson: q_median /
    # type_list / multimodal_features passed locally, failed driver-side).
    if len(df):
        for c in df.columns:
            # first NON-NULL value: a column whose first cell is null but
            # holds arrays later would slip past and fail opaquely
            nonnull = df[c].dropna()
            if not len(nonnull):
                continue
            v = nonnull.iloc[0]
            if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
                raise TypeError(
                    f"column {c} holds arrays; driver cannot sort these")

    def norm(v):
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, float):
            return repr(v)
        if pd.isna(v):
            return "<null>"
        return str(v)

    out = df.map(norm)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.sql(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1
            elif len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
            elif not g.equals(w):
                neq = (g != w).any(axis=1)
                i = neq.idxmax()
                print(f"FAIL {name}: value mismatch, first at row {i}:")
                print("  spark :", g.iloc[i].to_dict())
                print("  oracle:", w.iloc[i].to_dict())
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
