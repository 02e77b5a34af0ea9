#!/usr/bin/env python3
"""Pre-tokenized DuckDB oracle for the bigram-LM query family
(bigram_lm, perplexity, ccnet_bucket, quality_clf, dsir_scores).

Why this exists: each of these queries' committed oracle SQL re-tokenizes
all of `documents` inside its own CTE chain. At sf100 (5M docs) that
tokenization dominates the oracle wall clock — round 12's chunked gate
had a 4-query chunk still running after 35 minutes, which capped the
sf100 tally at the oracle side, not the engine side. This sidecar
tokenizes ONCE into a materialized bigram-pair table and evaluates each
query's remaining algebra against it — the same trick as
tools/embed_oracle.py for the embedding family.

Soundness: every rewritten query below is the committed oracle from
SparkEntry.oracleSql with its `toks`/`tk` + `pr` CTEs replaced by reads
of the shared materialization (and the `vv` distinct-vocab scalar
precomputed from the same tokens). Equivalence is not taken on faith:
`--selfcheck <smallSfDir>` runs BOTH spellings at a small SF and fails
on any mismatch; run it before trusting a large-SF verdict.

Comparison is the same discipline as tools/check.py: exact pandas frame
compare below GRAFT_HASH_THRESHOLD rows, DuckDB-native multiset-hash
aggregates above it.

Usage:
  python3 tools/lm_oracle.py <sfDir> <verifyOutDir> [names]
  python3 tools/lm_oracle.py --selfcheck <smallSfDir>
Env: GRAFT_DUCK_THREADS / GRAFT_DUCK_MEM / GRAFT_DUCK_TMP caps,
GRAFT_HASH_THRESHOLD (default 5000000).
"""
import json
import os
import sys

import duckdb

# Shared materialization: one tokenization pass over `documents`.
# (doc_id, lang, pair) — lang kept for dsir's target-distribution CTE.
PR_MAT = """
CREATE TEMP TABLE pr_mat AS
WITH tk AS (SELECT doc_id, lang,
    list_filter(regexp_split_to_array(text, ' +'), t -> t <> '') toks
  FROM documents)
SELECT doc_id, lang, unnest(list_transform(range(1, len(toks)),
    i -> toks[i] || ' ' || toks[i+1])) AS pair
FROM tk WHERE len(toks) >= 2
"""

# |V| for the +1-smoothed LM (perplexity / ccnet_bucket `vv` CTE):
# distinct tokens over ALL docs (including len<2 docs, matching the
# committed oracle, whose `toks` CTE has no length filter).
VTOT = """
WITH tk AS (SELECT
    list_filter(regexp_split_to_array(text, ' +'), t -> t <> '') toks
  FROM documents)
SELECT CAST(count(DISTINCT t) AS DOUBLE) FROM (SELECT unnest(toks) AS t FROM tk)
"""

# Each entry: committed oracle with its toks/tk+pr CTEs replaced by
# pr_mat and vv replaced by the precomputed {V} scalar. The remaining
# algebra is VERBATIM from SparkEntry.oracleSql.
REWRITTEN = {
    "bigram_lm": """
WITH pr AS (SELECT pair FROM pr_mat),
cnt AS (SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM pr GROUP BY pair)
SELECT pair, n, round(CAST(n AS DOUBLE) /
  CAST(sum(n) OVER (PARTITION BY split_part(pair, ' ', 1))
    AS DOUBLE), 4) AS p_cond
FROM cnt ORDER BY n DESC, pair LIMIT 30
""",
    "perplexity": """
WITH pr AS (SELECT doc_id, pair FROM pr_mat),
lm AS (SELECT pair, CAST(count(*) AS DOUBLE) AS n_ab
       FROM pr GROUP BY pair),
pre AS (SELECT split_part(pair, ' ', 1) AS w1, sum(n_ab) AS n_w1
        FROM lm GROUP BY 1),
vv AS (SELECT CAST({V} AS DOUBLE) AS v),
p AS (SELECT lm.pair, (lm.n_ab + 1.0) / (pre.n_w1 + vv.v) AS prob
      FROM lm JOIN pre ON split_part(lm.pair, ' ', 1) = pre.w1
      CROSS JOIN vv)
SELECT pr.doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
  round(-avg(log2(p.prob)), 4) AS cross_entropy
FROM pr JOIN p USING (pair)
GROUP BY pr.doc_id ORDER BY pr.doc_id
""",
    "ccnet_bucket": """
WITH pr AS (SELECT doc_id, pair FROM pr_mat),
lm AS (SELECT pair, CAST(count(*) AS DOUBLE) AS n_ab
       FROM pr GROUP BY pair),
pre AS (SELECT split_part(pair, ' ', 1) AS w1, sum(n_ab) AS n_w1
        FROM lm GROUP BY 1),
vv AS (SELECT CAST({V} AS DOUBLE) AS v),
p AS (SELECT lm.pair, (lm.n_ab + 1.0) / (pre.n_w1 + vv.v) AS prob
      FROM lm JOIN pre ON split_part(lm.pair, ' ', 1) = pre.w1
      CROSS JOIN vv),
ce AS (SELECT pr.doc_id,
         round(-avg(log2(p.prob)), 4) AS cross_entropy
       FROM pr JOIN p USING (pair) GROUP BY pr.doc_id),
cl AS (SELECT ce.doc_id, d.lang, ce.cross_entropy,
         row_number() OVER (PARTITION BY d.lang
           ORDER BY ce.cross_entropy, ce.doc_id) AS rn,
         count(*) OVER (PARTITION BY d.lang) AS cnt
       FROM ce JOIN documents d ON ce.doc_id = d.doc_id)
SELECT lang,
  CASE WHEN rn*3 <= cnt THEN 'head'
       WHEN rn*3 <= cnt*2 THEN 'middle' ELSE 'tail' END AS bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  min(cross_entropy) AS min_ce, max(cross_entropy) AS max_ce
FROM cl GROUP BY 1, 2 ORDER BY 1, 2
""",
    "quality_clf": """
WITH pr AS (SELECT doc_id, pair FROM pr_mat),
pb AS (SELECT doc_id,
    (('0x' || substr(md5(pair), 1, 8))::BIGINT % 256) AS b FROM pr),
w AS (SELECT b,
    (('0x' || substr(md5('w:' || b), 1, 8))::BIGINT % 201 - 100) AS w
  FROM (SELECT unnest(range(0, 256)) AS b))
SELECT pb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
  CAST(sum(w.w) AS BIGINT) AS score,
  CASE WHEN sum(w.w) > 0 THEN 'keep' ELSE 'drop' END AS label
FROM pb JOIN w USING (b)
GROUP BY 1 ORDER BY 1
""",
    "dsir_scores": """
WITH pr AS (SELECT doc_id, pair FROM pr_mat),
pb AS (SELECT doc_id,
    (('0x' || substr(md5(pair), 1, 8))::BIGINT % 256) AS b FROM pr),
tpr AS (SELECT pair FROM pr_mat WHERE lang = 'de'),
tb AS (SELECT
    (('0x' || substr(md5(pair), 1, 8))::BIGINT % 256) AS b FROM tpr),
q AS (SELECT b, CAST(count(*) AS BIGINT) AS nq FROM pb GROUP BY 1),
p AS (SELECT b, CAST(count(*) AS BIGINT) AS np FROM tb GROUP BY 1),
qt AS (SELECT CAST(sum(nq) AS BIGINT) AS qtot FROM q),
pt AS (SELECT CAST(sum(np) AS BIGINT) AS ptot FROM p),
lr AS (SELECT q.b,
    ln((CAST(coalesce(p.np, 0) AS DOUBLE) + 1.0)
       / (CAST(pt.ptot AS DOUBLE) + 256.0))
  - ln((CAST(q.nq AS DOUBLE) + 1.0)
       / (CAST(qt.qtot AS DOUBLE) + 256.0)) AS lr
  FROM q LEFT JOIN p USING (b) CROSS JOIN pt CROSS JOIN qt)
SELECT pb.doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
  round(avg(lr), 4) + 0.0 AS dsir_score
FROM pb JOIN lr USING (b)
GROUP BY 1 ORDER BY 1
""",
}

TABLES = ["documents"]


def connect(sf_dir):
    con = duckdb.connect()
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.sql(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.sql(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
    if os.environ.get("GRAFT_DUCK_TMP"):
        con.sql(f"SET temp_directory='{os.environ['GRAFT_DUCK_TMP']}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


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


def selfcheck(sf_dir, oracle_path=None):
    """Run committed oracle vs rewritten spelling at a small SF.
    `oracle_path` may be an oracle_sql.json file or a dump dir holding
    one (preferred); the /tmp candidates are a convenience fallback."""
    oracle = {}
    cands = []
    if oracle_path:
        cands = [oracle_path, f"{oracle_path}/oracle_sql.json"]
    cands += [f"{c}/oracle_sql.json"
              for c in ["/tmp/verify_strat", "/tmp/verify_out",
                        "/tmp/verify_sf100"]]
    for p in cands:
        if os.path.isfile(p):
            oracle = json.load(open(p))
            break
    assert oracle, ("no oracle_sql.json found for selfcheck — pass its "
                    "path: --selfcheck <sfDir> <oracle_sql.json|dumpDir>")
    con = connect(sf_dir)
    con.sql(PR_MAT)
    v = con.sql(VTOT).fetchone()[0]
    bad = 0
    for name, sql in REWRITTEN.items():
        got = canon(con.sql(sql.format(V=v)).df())
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
    names = sorted(REWRITTEN) if len(sys.argv) < 4 else sys.argv[3].split(",")
    unknown = set(names) - set(REWRITTEN)
    assert not unknown, f"not an LM-family query: {sorted(unknown)}"
    thresh = int(os.environ.get("GRAFT_HASH_THRESHOLD", "5000000"))
    con = connect(sf_dir)
    con.sql(PR_MAT)
    v = con.sql(VTOT).fetchone()[0]
    failed = []
    for name in names:
        sql = REWRITTEN[name].format(V=v)
        dump = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        try:
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
            print(f"OK   {name}: {n_dump} rows (pre-tokenized oracle)")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
