#!/usr/bin/env python3
"""Pre-materialized DuckDB oracle for the MinHash/LSH query family
(minhash_sig, lsh_pairs, dedup_clusters, corpus_clean_cc, incr_neardup).

Why this exists: each of these queries' committed oracle SQL recomputes
the full MinHash signature CTE chain — tokenize 5M documents, build
3-gram shingles, take 8 md5-permutation minima per doc — inside its own
query. At sf100 that signature pass alone runs ~40+ minutes in DuckDB
and is repeated PER QUERY (round-13: the corpus_clean_cc singleton
chunk had not finished after 45 minutes), capping the sf100 tally at
the oracle side exactly like the bigram-LM family before
tools/lm_oracle.py. This sidecar materializes the signature table ONCE
and evaluates each query's remaining algebra against it.

Two committed spellings are additionally intractable at sf100 as
written, and are re-spelled here with EXACT equivalents:

- The transitive-closure `walk` recursive CTE (dedup_clusters,
  corpus_clean_cc) assigns every edge-touched node the MINIMUM node id
  reachable from it. Every node of a component is an edge source
  (edges are symmetrized), so that minimum is the component's minimum
  node id — computed here by union-find with min-id representatives.
  Same function, no fixpoint iteration.
- incr_neardup's bc/bb joins are written as ALL-PAIRS nested loops
  with a >=6-of-8 signature-match predicate (5.5e12 comparisons at
  sf100). Pigeonhole makes banding exact, not approximate: >=6 matches
  of 8 positions leaves <=2 mismatches, which can spoil at most 2 of
  the 4 DISJOINT 2-position bands, so every qualifying pair shares
  >=2 intact bands and appears in the band-bucket join. The sidecar
  generates candidates by band equality and verifies the >=6 predicate
  exactly on the candidates — the same pair set by construction.

Soundness is not taken on faith: `--selfcheck <smallSfDir>` runs BOTH
spellings (committed oracle vs sidecar) at a small SF and fails on any
mismatch; run it before trusting a large-SF verdict.

Comparison discipline matches tools/check.py: exact pandas frame
compare below GRAFT_HASH_THRESHOLD rows, DuckDB-native multiset-hash
aggregates above it.

Usage:
  python3 tools/minhash_oracle.py <sfDir> <verifyOutDir> [names]
  python3 tools/minhash_oracle.py --selfcheck <smallSfDir>
Env: GRAFT_DUCK_THREADS / GRAFT_DUCK_MEM / GRAFT_DUCK_TMP caps,
GRAFT_HASH_THRESHOLD (default 5000000).
"""
import json
import os
import sys

import duckdb

NAMES = ["minhash_sig", "lsh_pairs", "dedup_clusters", "corpus_clean_cc",
         "incr_neardup", "contrastive", "corpus_clean", "group_sketch",
         "simhash_pairs"]
# Names whose algebra reads the materialized MinHash signature table;
# simhash_pairs instead needs only the (much cheaper) 16-bit SimHash
# table, so a simhash_pairs-only invocation skips the signature pass.
SIG_NAMES = set(NAMES) - {"simhash_pairs"}

# One signature pass over `documents` — the shared CTE chain verbatim
# from the committed oracles (toks -> sh -> sigs). A doc's signature
# depends only on its own text, so corpus_clean_cc's filtered-universe
# sigs2 is exactly sigs joined to its kept-doc set.
SIGS_MAT = """
CREATE TEMP TABLE sigs AS
WITH toks AS (SELECT doc_id,
  list_filter(regexp_split_to_array(text, ' +'), t -> t <> '') toks
  FROM documents), sh AS (SELECT doc_id,
  CASE WHEN len(toks) >= 3
    THEN list_distinct(list_transform(range(0, len(toks)-2),
           i -> array_to_string(list_slice(toks, i+1, i+3), ' ')))
    ELSE [array_to_string(toks, ' ')] END shingles
  FROM toks)
SELECT doc_id, list_transform(range(0, 8), j ->
  list_min(list_transform(shingles,
    s -> md5(CAST(j AS VARCHAR) || '|' || s)))) sig
FROM sh
"""

# Doc metadata the non-signature algebra needs (corpus_clean_cc's
# len-filter + exact-dup keep): one cheap scan.
META_MAT = """
CREATE TEMP TABLE doc_meta AS
SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5,
  len(list_filter(regexp_split_to_array(text, ' +'), t -> t <> ''))
    AS n_toks
FROM documents
"""

BANDS = """
SELECT doc_id, sig, b.band,
  md5(array_to_string(list_slice(sig, band*2+1, band*2+2), ',')) bh
FROM {src} CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b
"""

# (a_id, b_id, n_bands, est) over a signature source — the committed
# bands-join verbatim, parameterized by source table.
PAIRS = """
SELECT a.doc_id AS a_id, c.doc_id AS b_id,
  CAST(count(*) AS BIGINT) AS n_bands,
  round(CAST(min(len(list_filter(range(1, 9),
    i -> a.sig[i] = c.sig[i]))) AS DOUBLE) / 8.0, 4) AS est_jaccard
FROM ({bands}) a JOIN ({bands}) c
  ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id
GROUP BY a.doc_id, c.doc_id
"""


def connect(sf_dir):
    con = duckdb.connect()
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.sql(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.sql(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
    if os.environ.get("GRAFT_DUCK_TMP"):
        con.sql(f"SET temp_directory='{os.environ['GRAFT_DUCK_TMP']}'")
    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
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


def min_label_components(edges):
    """Union-find with min-id representatives over symmetric edge list:
    returns {node: min node id in its component} for every edge-touched
    node — exactly the committed walk-CTE's min(comp) per id."""
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id root keeps the invariant root == min(component)
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {n: find(n) for n in parent}


def load_components(con, src):
    """Edges from the banded pair join at est >= 0.75 over signature
    source `src`, then min-label components in Python."""
    pairs = PAIRS.format(bands=BANDS.format(src=src))
    edges = con.sql(
        f"SELECT a_id, b_id FROM ({pairs}) WHERE est_jaccard >= 0.75"
    ).fetchall()
    return min_label_components(edges)


def comp_table(con, comp, name):
    # Bulk path: register the label map as a pandas frame and CTAS from
    # it — a single vectorized insert instead of row-by-row executemany
    # (at sf100 component sizes the executemany round-trips dominated).
    import pandas as pd
    df = pd.DataFrame(list(comp.items()) or None,
                      columns=["id", "comp"]).astype("int64")
    con.register(f"__{name}_src", df)
    con.sql(f"CREATE OR REPLACE TEMP TABLE {name} AS "
            f"SELECT CAST(id AS BIGINT) id, CAST(comp AS BIGINT) comp "
            f"FROM __{name}_src")
    con.unregister(f"__{name}_src")


def result_sql(con, name):
    """Build the sidecar result for `name` as a SQL string (temp tables
    are created as needed)."""
    if name == "minhash_sig":
        return ("SELECT doc_id, array_to_string(sig, ',') AS sig "
                "FROM sigs ORDER BY doc_id")
    if name == "lsh_pairs":
        pairs = PAIRS.format(bands=BANDS.format(src="sigs"))
        return f"SELECT * FROM ({pairs}) ORDER BY a_id, b_id"
    if name == "dedup_clusters":
        comp = load_components(con, "sigs")
        comp_table(con, comp, "dc_comp")
        return ("SELECT id AS doc_id, CAST(comp AS BIGINT) AS comp "
                "FROM dc_comp ORDER BY 1")
    if name == "corpus_clean_cc":
        # q: len-filtered docs; keep: exact-dup keepers within q;
        # k: kept docs (the committed CTE chain off doc_meta)
        con.sql("""CREATE OR REPLACE TEMP TABLE cc_k AS
          SELECT m.* FROM doc_meta m JOIN (
            SELECT min(doc_id) doc_id FROM doc_meta
            WHERE n_toks >= 20 GROUP BY text_md5) keep USING (doc_id)
          WHERE m.n_toks >= 20""")
        con.sql("""CREATE OR REPLACE TEMP TABLE cc_sigs AS
          SELECT s.doc_id, s.sig FROM sigs s JOIN cc_k USING (doc_id)""")
        comp = load_components(con, "cc_sigs")
        losers = {n for n, c in comp.items() if c != n}
        comp_table(con, {n: n for n in losers}, "cc_losers")
        return ("SELECT doc_id, lang, source, n_chars FROM cc_k "
                "WHERE doc_id NOT IN (SELECT id FROM cc_losers) "
                "ORDER BY doc_id")
    if name == "incr_neardup":
        # Candidates by band equality are an EXACT superset of the
        # >=6-of-8 predicate (pigeonhole: <=2 mismatches spoil <=2 of
        # the 4 disjoint 2-position bands), verified exactly below.
        con.sql("CREATE OR REPLACE TEMP TABLE inc_b AS "
                "SELECT * FROM sigs WHERE doc_id % 3 = 0")
        con.sql("CREATE OR REPLACE TEMP TABLE inc_c AS "
                "SELECT * FROM sigs WHERE doc_id % 3 <> 0")
        bb = BANDS.format(src="inc_b")
        bc = BANDS.format(src="inc_c")
        con.sql(f"""CREATE OR REPLACE TEMP TABLE inc_bc AS
          SELECT DISTINCT cand.a FROM (
            SELECT DISTINCT a.doc_id a, c.doc_id c
            FROM ({bb}) a JOIN ({bc}) c
              ON a.band = c.band AND a.bh = c.bh) cand
          JOIN inc_b sb ON sb.doc_id = cand.a
          JOIN inc_c sc ON sc.doc_id = cand.c
          WHERE len(list_filter(range(1, 9),
            i -> sb.sig[i] = sc.sig[i])) >= 6""")
        con.sql(f"""CREATE OR REPLACE TEMP TABLE inc_bb AS
          SELECT DISTINCT cand.b FROM (
            SELECT DISTINCT a.doc_id a, c.doc_id b
            FROM ({bb}) a JOIN ({bb}) c
              ON a.band = c.band AND a.bh = c.bh
              AND a.doc_id < c.doc_id) cand
          JOIN inc_b s1 ON s1.doc_id = cand.a
          JOIN inc_b s2 ON s2.doc_id = cand.b
          WHERE len(list_filter(range(1, 9),
            i -> s1.sig[i] = s2.sig[i])) >= 6""")
        return """SELECT s.doc_id,
            s.doc_id IN (SELECT a FROM inc_bc) AS dup_of_corpus,
            s.doc_id IN (SELECT b FROM inc_bb) AS dup_in_batch,
            NOT (s.doc_id IN (SELECT a FROM inc_bc)
                 OR s.doc_id IN (SELECT b FROM inc_bb)) AS survives
          FROM inc_b s ORDER BY doc_id"""
    if name == "contrastive":
        # lsh_pairs at est >= 0.5 + the committed deterministic negative
        # sampling arithmetic, over the one materialized sigs pass.
        pairs = PAIRS.format(bands=BANDS.format(src="sigs"))
        return f"""WITH pr AS ({pairs}),
          p AS (SELECT a_id AS anchor, b_id AS positive FROM pr
                WHERE est_jaccard >= 0.5),
          mx AS (SELECT max(doc_id) AS m FROM doc_meta),
          t AS (SELECT anchor, positive,
            CASE WHEN (anchor*7919+13) % (m+1) <> anchor
                  AND (anchor*7919+13) % (m+1) <> positive
                 THEN (anchor*7919+13) % (m+1)
                 WHEN (anchor*7919+14) % (m+1) <> anchor
                  AND (anchor*7919+14) % (m+1) <> positive
                 THEN (anchor*7919+14) % (m+1)
                 ELSE (anchor*7919+15) % (m+1) END AS negative
            FROM p CROSS JOIN mx)
          SELECT anchor, positive, negative FROM t
          WHERE negative IN (SELECT doc_id FROM doc_meta)
          ORDER BY anchor, positive"""
    if name == "corpus_clean":
        # Same len-filter + exact-dup keep universe as corpus_clean_cc
        # (cc_k), but survivors drop every DIRECT est>=0.75 b_id instead
        # of component losers.
        con.sql("""CREATE OR REPLACE TEMP TABLE ccd_k AS
          SELECT m.* FROM doc_meta m JOIN (
            SELECT min(doc_id) doc_id FROM doc_meta
            WHERE n_toks >= 20 GROUP BY text_md5) keep USING (doc_id)
          WHERE m.n_toks >= 20""")
        con.sql("""CREATE OR REPLACE TEMP TABLE ccd_sigs AS
          SELECT s.doc_id, s.sig FROM sigs s JOIN ccd_k USING (doc_id)""")
        pairs = PAIRS.format(bands=BANDS.format(src="ccd_sigs"))
        return (f"SELECT doc_id, lang, source, n_chars FROM ccd_k "
                f"WHERE doc_id NOT IN (SELECT DISTINCT b_id FROM ({pairs}) "
                f"WHERE est_jaccard >= 0.75) ORDER BY doc_id")
    if name == "simhash_pairs":
        # The committed oracle filters its band-join to `hamming <= 0`,
        # i.e. IDENTICAL 16-bit sketches. For equal sketches the band
        # join matches on BOTH 8-bit bands and the GROUP BY collapses
        # them to one row with min-xor 0 — so the whole
        # band/group/min/filter pipeline degenerates EXACTLY to the
        # equal-sh self-join below (each qualifying pair once, hamming
        # 0; no aggregation state, so nothing to spill — the committed
        # spelling's 738M-group hash aggregate exceeded the sandbox
        # disk at sf100). s16 is the committed simhash16 CTE verbatim.
        con.sql("""CREATE OR REPLACE TEMP TABLE s16 AS
          WITH toks AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, ' +'), t -> t <> '')
              toks FROM documents),
          h AS (SELECT doc_id, list_transform(toks, t -> md5(t)) hs
            FROM toks)
          SELECT doc_id, CAST(list_sum(list_transform(range(0, 16), j ->
            CASE WHEN list_sum(list_transform(hs, h ->
                CASE WHEN substr(h, j+1, 1) >= '8' THEN 1 ELSE -1 END)) > 0
            THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)) AS BIGINT) sh
          FROM h""")
        return ("SELECT a.doc_id AS a_id, c.doc_id AS b_id, "
                "CAST(0 AS INTEGER) AS hamming "
                "FROM s16 a JOIN s16 c ON a.sh = c.sh "
                "AND a.doc_id < c.doc_id ORDER BY a_id, b_id")
    if name == "group_sketch":
        mins = ", ".join(f"min(sig[{i}])" for i in range(1, 9))
        return (f"SELECT d.lang, array_to_string([{mins}], ',') AS sketch "
                f"FROM sigs s JOIN doc_meta d USING (doc_id) "
                f"GROUP BY d.lang ORDER BY d.lang")
    raise AssertionError(f"not a minhash-family query: {name}")


def committed_oracle(explicit=None):
    """Load the committed oracle_sql.json. `explicit` may be the json
    file itself or a dump dir containing it (preferred — the /tmp
    candidates are a convenience fallback for the usual dump spots)."""
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


def selfcheck(sf_dir, oracle_path=None):
    oracle = committed_oracle(oracle_path)
    assert oracle, ("no oracle_sql.json found for selfcheck — pass its "
                    "path: --selfcheck <sfDir> <oracle_sql.json|dumpDir>")
    con = connect(sf_dir)
    con.sql(SIGS_MAT)
    con.sql(META_MAT)
    bad = 0
    for name in NAMES:  # small SF: always materialize, check everything
        got = canon(con.sql(result_sql(con, name)).df())
        want = canon(con.sql(oracle[name]).df())
        err = frames_equal(got, want)
        if err:
            print(f"SELFCHECK FAIL {name}: {err}")
            bad += 1
        else:
            print(f"SELFCHECK OK   {name}: {len(got)} rows")
    sys.exit(1 if bad else 0)


def main():
    if sys.argv[1] == "--selfcheck":
        selfcheck(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = NAMES if len(sys.argv) < 4 else sys.argv[3].split(",")
    unknown = set(names) - set(NAMES)
    assert not unknown, f"not a minhash-family query: {sorted(unknown)}"
    thresh = int(os.environ.get("GRAFT_HASH_THRESHOLD", "5000000"))
    con = connect(sf_dir)
    # The signature pass is the ~40-min-at-sf100 cost; skip it when the
    # requested subset doesn't read it (e.g. a simhash_pairs-only gate).
    if any(n in SIG_NAMES for n in names):
        con.sql(SIGS_MAT)
        con.sql(META_MAT)
    failed = []
    for name in names:
        dump = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        try:
            sql = result_sql(con, name)
            n_dump = con.sql(f"SELECT count(*) FROM ({dump})").fetchone()[0]
            if n_dump > thresh:
                gc, gs = multiset_sig(con, dump)
                wc, ws = multiset_sig(con, f"({sql})")
                err = (f"columns {gc} != {wc}" if gc != wc else
                       f"multiset hash differs ({gs} vs {ws})" if gs != ws
                       else None)
            else:
                err = frames_equal(canon(con.sql(dump).df()),
                                   canon(con.sql(sql).df()))
        except Exception as e:
            err = str(e)
        if err:
            print(f"FAIL {name}: {err}")
            failed.append(name)
        else:
            print(f"OK   {name}: {n_dump} rows (minhash sidecar)")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
