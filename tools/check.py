#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [names]

Registers each testdata table as a DuckDB view, runs every oracle SQL from
<verifyOutDir>/oracle_sql.json, and compares against the Spark parquet dump
at <verifyOutDir>/<name>/ — columns sorted by name, rows sorted, exact value
compare (the strictest plausible version of the driver's hash compare).

Optional [names] (comma-separated) restricts to a subset — the large-SF
gate runs the suite in CHUNKED FRESH PROCESSES with it, because one
long-lived DuckDB process accumulating 196 heavy oracle results OOMed in
the round-10 sf10 run and cascaded 9 spurious FAILs.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    # Resource caps so a large-SF oracle run can share the box with a
    # concurrent Spark dump (and can't OOM it): unset = DuckDB defaults.
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.sql(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.sql(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
    if os.environ.get("GRAFT_DUCK_TMP"):
        con.sql(f"SET temp_directory='{os.environ['GRAFT_DUCK_TMP']}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata: single parquet file; ScaleUp output: a
        # Spark-written directory of part files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3 and sys.argv[3]:
        keep = set(sys.argv[3].split(","))
        missing = keep - set(oracle)
        if missing:
            print(f"FAIL unknown query names: {sorted(missing)}")
            sys.exit(1)
        oracle = {k: v for k, v in oracle.items() if k in keep}
    # Outputs past this row count skip the pandas frame compare (a 600M-row
    # winsorize dump at sf100 would not fit a sortable frame) and compare
    # as DuckDB-native multiset aggregates instead: identical row count +
    # sum/min/max/avg of hash(row) over name-sorted columns. Same multiset
    # of rows ⟺ equal aggregates (up to 64-bit hash collisions); both
    # engines' values are bit-exact by the oracle discipline, so hashing
    # them is sound. Default threshold keeps every small-SF gate on the
    # exact pandas path.
    hash_threshold = int(os.environ.get("GRAFT_HASH_THRESHOLD", "5000000"))

    def multiset_sig(rel_sql):
        cols = [r[0] for r in con.sql(f"DESCRIBE {rel_sql}").fetchall()]
        hcols = ", ".join(f'"{c}"' for c in sorted(cols))
        return sorted(cols), con.sql(
            f"SELECT count(*), sum(hash({hcols})), min(hash({hcols})), "
            f"max(hash({hcols})), avg(hash({hcols})) FROM ({rel_sql})"
        ).fetchone()

    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            dump_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            n_dump = con.sql(
                f"SELECT count(*) FROM ({dump_sql})").fetchone()[0]
            if n_dump > hash_threshold:
                gc, gsig = multiset_sig(dump_sql)
                wc, wsig = multiset_sig(sql)
                if gc != wc:
                    print(f"FAIL {name}: columns {gc} != {wc}")
                    failed.append(name)
                elif gsig != wsig:
                    print(f"FAIL {name}: multiset hash differs "
                          f"(spark {gsig} vs duck {wsig})")
                    failed.append(name)
                else:
                    print(f"OK   {name}: {n_dump} rows (multiset-hash)")
                continue
            got = con.sql(dump_sql).df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failed.append(name)
            continue
        if g.shape != w.shape:
            print(f"FAIL {name}: shape {g.shape} != {w.shape}")
            failed.append(name)
            continue
        gtypes, wtypes = list(map(str, g.dtypes)), list(map(str, w.dtypes))
        if gtypes != wtypes:
            print(f"WARN {name}: dtypes {gtypes} != {wtypes}")
        neq = (g.astype(str) != w.astype(str))
        if neq.any().any():
            bad = neq.any(axis=1)
            idx = bad[bad].index[:3]
            print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ; first:")
            for i in idx:
                print(f"  spark: {g.loc[i].to_dict()}")
                print(f"  duck:  {w.loc[i].to_dict()}")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(g)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
