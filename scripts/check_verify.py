#!/usr/bin/env python3
"""Replicate the driver's DuckDB-oracle compare locally.

Usage: python3 scripts/check_verify.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB against the sfDir tables, then
compare schemas (sorted column names), row counts, and a value hash computed
over column-name-sorted, row-sorted string renderings.
"""
import json, sys, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # stable row order: sort by all columns as strings
    sdf = df.astype(str)
    order = sdf.sort_values(by=list(sdf.columns)).index
    return df.loc[order].reset_index(drop=True)


def value_hash(df):
    df = norm(df)
    h = hashlib.sha256()
    h.update(("|".join(df.columns)).encode())
    for row in df.astype(str).itertuples(index=False):
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            # cross-reader render guard (r13 root cause): the driver reads
            # the engine parquet with a DIFFERENT reader than this script's
            # DuckDB scan, and e.g. parquet DECIMAL renders `N` under
            # pyarrow but `N.0` under a DuckDB float64 read — identical
            # values, divergent hashes. Hash the pyarrow rendering too so a
            # local green can't hide a driver-side mismatch.
            pa_got = pq.read_table(f"{out_dir}/{name}").to_pandas()
            if value_hash(pa_got) != value_hash(got):
                failures.append((name, "READER-DIVERGENT rendering: pyarrow "
                                 "and duckdb hash this parquet differently "
                                 "(non-portable output type, e.g. DECIMAL)"))
                print(f"READER-DIVERGENT {name}")
                continue
            want = con.execute(sql).df()
            gs, ws = sorted(got.columns), sorted(want.columns)
            if gs != ws:
                failures.append((name, f"schema {gs} != {ws}"))
                continue
            if len(got) != len(want):
                failures.append((name, f"rows {len(got)} != {len(want)}"))
                continue
            gh, wh = value_hash(got), value_hash(want)
            status = "OK " if gh == wh else "HASH-MISMATCH"
            if gh != wh:
                g, w = norm(got).astype(str), norm(want).astype(str)
                diff = (g != w).any(axis=1)
                idx = list(g.index[diff])[:3]
                failures.append((name, f"hash mismatch; first diff rows {idx}:\n"
                                 f"got:\n{g.loc[idx]}\nwant:\n{w.loc[idx]}"))
            print(f"{status} {name}: rows={len(got)}")
        except Exception as e:  # noqa
            failures.append((name, f"ERROR {e}"))
            print(f"ERR {name}: {e}")
    print()
    if failures:
        print(f"=== {len(failures)} FAILURES ===")
        for n, msg in failures:
            print(f"--- {n}: {msg}\n")
        sys.exit(1)
    print(f"=== all {len(oracle)} queries match ===")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
