#!/usr/bin/env python3
"""Disk-backed DuckDB oracle for `span_dedup` (and its audit twin
`dup_spans` if asked).

Why this exists: the committed span_dedup oracle SQL is a single
pipeline that materializes ~400M 8-gram STRINGS (window-partitioned by
the span text), a ~500M-row per-token anti-join, and a per-doc
string_agg all in one query — at sf100 DuckDB spilled 43 GB and then
OOMed at a 64 GB cap (BASELINE.md round-13), making span_dedup the one
named oracle exclusion. This sidecar computes the SAME algebra staged
through tables in a FILE-BACKED database (every intermediate lives on
disk, not in the allocator), with two exact re-spellings:

- The span string is replaced by its md5 digest, carried as two
  BIGINT halves (16 bytes vs ~50+ byte strings). md5-equality is the
  repo's standing exact-dedup standard (the committed corpus_clean
  oracles group on md5(text); the sf100 stratum predicate is md5 too).
- The first-occurrence window `row_number() OVER (PARTITION BY span
  ORDER BY doc_id, i) > 1` is re-spelled as "every occurrence whose
  (doc_id, i) key exceeds the span's minimum key" via a group-by —
  identical set ((doc_id, i) is unique so rn=1 IS the lexicographic
  minimum), no global window sort. The key packs (doc_id, i) into one
  BIGINT (doc_id * 2^32 + i), validity asserted from the data.
- The per-doc reconstruction (token explode -> anti-join covered
  positions -> ordered string_agg) runs in doc_id % K buckets,
  appending to an on-disk result table, so peak state is 1/K of the
  corpus regardless of SF.

Soundness is not taken on faith: `--selfcheck <smallSfDir>
[oracleJson|dumpDir]` runs BOTH spellings (committed oracle SQL vs
this sidecar) at a small SF and fails on any mismatch.

Comparison discipline matches tools/check.py: exact pandas frame
compare below GRAFT_HASH_THRESHOLD rows, DuckDB-native multiset-hash
aggregates above it.

Usage:
  python3 tools/span_oracle.py <sfDir> <verifyOutDir> [names]
  python3 tools/span_oracle.py --selfcheck <smallSfDir> [oracleJson|dumpDir]
Env: GRAFT_DUCK_THREADS / GRAFT_DUCK_MEM / GRAFT_DUCK_TMP,
GRAFT_SPAN_BUCKETS (default: ceil(n_docs / 250k)),
GRAFT_HASH_THRESHOLD (default 5000000).
"""
import json
import math
import os
import shutil
import sys
import tempfile

import duckdb

NAMES = ["span_dedup", "dup_spans"]
SPAN = 8


def connect(sf_dir, db_path):
    con = duckdb.connect(db_path)
    threads = int(os.environ.get("GRAFT_DUCK_THREADS", "16"))
    con.sql(f"SET threads={threads}")
    con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '36GB')}'")
    tmp = os.environ.get("GRAFT_DUCK_TMP")
    if tmp:
        con.sql(f"SET temp_directory='{tmp}'")
    con.sql("SET preserve_insertion_order=false")
    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.sql(f"CREATE OR REPLACE VIEW documents AS "
            f"SELECT * FROM read_parquet('{path}')")
    return con


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort") \
           .reset_index(drop=True)
    return df


def frames_equal(g, w):
    if list(g.columns) != list(w.columns):
        return f"columns {list(g.columns)} != {list(w.columns)}"
    if g.shape != w.shape:
        return f"shape {g.shape} != {w.shape}"
    neq = (g.astype(str) != w.astype(str))
    if neq.any().any():
        bad = neq.any(axis=1)
        i = bad[bad].index[0]
        return (f"{int(bad.sum())}/{len(g)} rows differ; first: "
                f"got {g.loc[i].to_dict()} want {w.loc[i].to_dict()}")
    return None


def multiset_sig(con, rel_sql):
    cols = [r[0] for r in con.sql(f"DESCRIBE {rel_sql}").fetchall()]
    hcols = ", ".join(f'"{c}"' for c in sorted(cols))
    return sorted(cols), con.sql(
        f"SELECT count(*), sum(hash({hcols})), min(hash({hcols})), "
        f"max(hash({hcols})), avg(hash({hcols})) FROM ({rel_sql})").fetchone()


def build_coverage(con, log=print):
    """Stages tokd / cov / rem tables: tokd(doc_id, toks), cov(doc_id, p)
    = positions covered by a non-first occurrence of a corpus-duplicated
    8-token span, rem(doc_id, nr) = covered-position counts."""
    log("stage 1/4: tokd (tokenized docs)")
    con.sql("""CREATE OR REPLACE TABLE tokd AS
      SELECT doc_id,
        list_filter(regexp_split_to_array(text, ' +'), t -> t <> '') toks
      FROM documents""")
    mx = con.sql("SELECT coalesce(max(doc_id), 0), "
                 "coalesce(max(len(toks)), 0) FROM tokd").fetchone()
    assert mx[0] < (1 << 31) and mx[1] < (1 << 32), \
        f"(doc_id, i) key packing invalid: max doc_id {mx[0]}, len {mx[1]}"

    log("stage 2/4: sp (span md5 halves, packed position key)")
    con.sql(f"""CREATE OR REPLACE TABLE sp AS
      WITH s AS (SELECT doc_id,
          unnest(range(0, len(toks)-{SPAN - 1})) AS i, toks
        FROM tokd WHERE len(toks) >= {SPAN}),
      d AS (SELECT doc_id, i,
          md5(array_to_string(toks[i+1:i+{SPAN}], ' ')) AS h FROM s)
      SELECT doc_id * 4294967296 + i AS k,
        ('0x' || substr(h, 1, 16))::UBIGINT AS h1,
        ('0x' || substr(h, 17, 16))::UBIGINT AS h2
      FROM d""")

    log("stage 3/4: cov (covered positions of non-first occurrences)")
    con.sql("""CREATE OR REPLACE TABLE dup_h AS
      SELECT h1, h2, min(k) AS mk FROM sp
      GROUP BY h1, h2 HAVING count(*) > 1""")
    con.sql(f"""CREATE OR REPLACE TABLE cov AS
      SELECT DISTINCT doc_id, p FROM (
        SELECT s.k // 4294967296 AS doc_id,
          unnest(range(s.k % 4294967296, s.k % 4294967296 + {SPAN})) AS p
        FROM sp s JOIN dup_h d ON s.h1 = d.h1 AND s.h2 = d.h2
        WHERE s.k <> d.mk)""")
    con.sql("DROP TABLE sp")
    con.sql("DROP TABLE dup_h")
    con.sql("CHECKPOINT")

    log("stage 4/4: rem (per-doc covered counts)")
    con.sql("""CREATE OR REPLACE TABLE rem AS
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nr FROM cov GROUP BY 1""")


def span_dedup_result(con, log=print):
    """Bucketed reconstruction: kept-token string_agg per doc_id % K
    bucket into the on-disk `res` table. Returns the result rel name."""
    n_docs = con.sql("SELECT count(*) FROM tokd").fetchone()[0]
    k = int(os.environ.get("GRAFT_SPAN_BUCKETS", "0")) \
        or max(1, math.ceil(n_docs / 250_000))
    con.sql("""CREATE OR REPLACE TABLE res (doc_id BIGINT, n_tokens BIGINT,
      n_removed BIGINT, clean_text VARCHAR)""")
    for b in range(k):
        log(f"  bucket {b + 1}/{k}")
        con.sql(f"""INSERT INTO res
          WITH tokb AS (SELECT doc_id, toks FROM tokd
            WHERE doc_id % {k} = {b}),
          tok AS (SELECT doc_id, unnest(toks) AS tok,
            unnest(range(0, len(toks))) AS p FROM tokb),
          covb AS (SELECT doc_id, p FROM cov WHERE doc_id % {k} = {b}),
          kept AS (SELECT tok.doc_id, tok.p, tok.tok FROM tok
            LEFT JOIN covb ON tok.doc_id = covb.doc_id AND tok.p = covb.p
            WHERE covb.p IS NULL),
          agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS ct
            FROM kept GROUP BY 1)
          SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
            coalesce(rem.nr, 0) AS n_removed,
            coalesce(agg.ct, '') AS clean_text
          FROM tokb t
          LEFT JOIN rem ON t.doc_id = rem.doc_id
          LEFT JOIN agg ON t.doc_id = agg.doc_id""")
    return "SELECT doc_id, n_tokens, n_removed, clean_text FROM res"


def dup_spans_result(con):
    """Gaps-and-islands merge over cov — identical algebra to the
    committed dup_spans oracle from the shared cov stage."""
    return """WITH isl AS (SELECT doc_id, p, p - row_number()
        OVER (PARTITION BY doc_id ORDER BY p) AS g FROM cov)
      SELECT doc_id, CAST(min(p) AS BIGINT) AS start_tok,
        CAST(max(p) AS BIGINT) AS end_tok,
        CAST(count(*) AS BIGINT) AS n_tokens
      FROM isl GROUP BY doc_id, g"""


def result_sql(con, name, log=print):
    if name == "span_dedup":
        return span_dedup_result(con, log)
    if name == "dup_spans":
        return dup_spans_result(con)
    raise AssertionError(f"not a span-family query: {name}")


def committed_oracle(explicit=None):
    cands = []
    if explicit:
        cands = [explicit, f"{explicit}/oracle_sql.json"]
    cands += [f"{c}/oracle_sql.json"
              for c in ["/tmp/verify_strat", "/tmp/verify_out",
                        "/tmp/verify_sf100"]]
    for p in cands:
        if os.path.isfile(p):
            return json.load(open(p))
    if explicit:
        raise SystemExit(f"selfcheck: no oracle_sql.json at {explicit}")
    return {}


def with_db(sf_dir, fn):
    work = tempfile.mkdtemp(prefix="span_oracle_",
                            dir=os.environ.get("GRAFT_DUCK_TMP"))
    try:
        con = connect(sf_dir, f"{work}/stage.duckdb")
        return fn(con)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def selfcheck(sf_dir, oracle_path=None):
    oracle = committed_oracle(oracle_path)
    assert oracle, ("no oracle_sql.json found for selfcheck — pass its "
                    "path: --selfcheck <sfDir> <oracle_sql.json|dumpDir>")

    def run(con):
        build_coverage(con, log=lambda *a: None)
        bad = 0
        for name in NAMES:
            got = canon(con.sql(result_sql(
                con, name, log=lambda *a: None)).df())
            want = canon(con.sql(oracle[name]).df())
            err = frames_equal(got, want)
            if err:
                print(f"SELFCHECK FAIL {name}: {err}")
                bad += 1
            else:
                print(f"SELFCHECK OK   {name}: {len(got)} rows")
        return bad

    sys.exit(1 if with_db(sf_dir, run) else 0)


def main():
    if sys.argv[1] == "--selfcheck":
        selfcheck(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = NAMES[:1] if len(sys.argv) < 4 else sys.argv[3].split(",")
    unknown = set(names) - set(NAMES)
    assert not unknown, f"not a span-family query: {sorted(unknown)}"
    thresh = int(os.environ.get("GRAFT_HASH_THRESHOLD", "5000000"))

    def run(con):
        build_coverage(con)
        failed = []
        for name in names:
            dump = (f"SELECT * FROM "
                    f"read_parquet('{out_dir}/{name}/*.parquet')")
            try:
                sql = result_sql(con, name)
                n_dump = con.sql(
                    f"SELECT count(*) FROM ({dump})").fetchone()[0]
                if n_dump > thresh:
                    gc, gs = multiset_sig(con, dump)
                    wc, ws = multiset_sig(con, f"({sql})")
                    err = (f"columns {gc} != {wc}" if gc != wc else
                           f"multiset hash differs ({gs} vs {ws})"
                           if gs != ws else None)
                else:
                    err = frames_equal(canon(con.sql(dump).df()),
                                       canon(con.sql(sql).df()))
            except Exception as e:
                err = str(e)
            if err:
                print(f"FAIL {name}: {err}")
                failed.append(name)
            else:
                print(f"OK   {name}: {n_dump} rows (span sidecar)")
        print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
        return failed

    sys.exit(1 if with_db(sf_dir, run) else 0)


if __name__ == "__main__":
    main()
