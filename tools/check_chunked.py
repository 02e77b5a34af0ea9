#!/usr/bin/env python3
"""Large-SF oracle gate driver: runs tools/check.py over the full oracle
suite in chunks of N queries, EACH CHUNK IN A FRESH PROCESS — DuckDB's
memory in one long-lived process OOMed at sf10 in round 10 and cascaded
9 spurious FAILs; fresh processes make every verdict independent.

embed_neardup / decontam_embed route to tools/embed_oracle.py (their
DuckDB spellings are inherently all-pairs; the sidecar is the bounded
exact oracle — see that file's docstring).

Usage: python3 tools/check_chunked.py <sfDir> <verifyOutDir> [chunk=12] [names]
[names]: optional comma-separated subset (or @file with one name per
line) — the partial-regeneration gates (e.g. re-gating only the
documents-derived queries after a fixture change) and the time-capped
sf100 gate compare exactly the queries that were dumped.
"""
import json
import os
import subprocess
import sys

SIDE_CAR = {"embed_neardup", "decontam_embed",
            "embed_neardup_strat", "decontam_embed_strat"}
# Pre-tokenized LM-family sidecar (tools/lm_oracle.py): opt-in via
# GRAFT_LM_SIDECAR=1 — the committed CTEs re-tokenize all of
# `documents` per query, which is fine at the driver's sf0.01 but
# capped the round-12 sf100 tally at the oracle side (one 4-query
# chunk >35 min). Selfcheck the sidecar (--selfcheck) before trusting
# a large-SF verdict.
LM_SIDECAR = {"bigram_lm", "perplexity", "ccnet_bucket", "quality_clf",
              "dsir_scores"}
# Pre-materialized MinHash-family sidecar (tools/minhash_oracle.py):
# opt-in via GRAFT_MINHASH_SIDECAR=1 — the committed CTEs recompute the
# 8-permutation signature pass over all of `documents` per query (and
# two of them are intractable as written at sf100: the recursive
# closure CTE and incr_neardup's all-pairs >=6-of-8 join). Selfcheck
# (--selfcheck) before trusting a large-SF verdict.
MINHASH_SIDECAR = {"minhash_sig", "lsh_pairs", "dedup_clusters",
                   "corpus_clean_cc", "incr_neardup", "contrastive",
                   "corpus_clean", "group_sketch", "simhash_pairs"}
# Disk-backed span-family sidecar (tools/span_oracle.py): opt-in via
# GRAFT_SPAN_SIDECAR=1 — the committed span_dedup CTE OOMed DuckDB at
# a 64 GB cap at sf100 (BASELINE.md round-13); the sidecar stages the
# span/coverage algebra through file-backed tables. Selfchecked like
# the others below.
SPAN_SIDECAR = {"span_dedup", "dup_spans"}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    names = sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
    if len(sys.argv) > 4:
        want = (set(l.strip() for l in open(sys.argv[4][1:]) if l.strip())
                if sys.argv[4].startswith("@")
                else set(sys.argv[4].split(",")))
        missing = want - set(names)
        if missing:
            print(f"unknown query names: {sorted(missing)}")
            sys.exit(2)
        names = [n for n in names if n in want]
    lm_route = (set(n for n in names if n in LM_SIDECAR)
                if os.environ.get("GRAFT_LM_SIDECAR") == "1" else set())
    mh_route = (set(n for n in names if n in MINHASH_SIDECAR)
                if os.environ.get("GRAFT_MINHASH_SIDECAR") == "1" else set())
    span_route = (set(n for n in names if n in SPAN_SIDECAR)
                  if os.environ.get("GRAFT_SPAN_SIDECAR") == "1" else set())
    # Sidecar coupling (round-13 ADVICE): a sidecar substitutes a
    # re-spelled oracle for the committed SQL, so before trusting it,
    # auto-selfcheck each active sidecar at a small SF against THIS
    # dump's committed oracle_sql.json. Opt out (e.g. no small SF on the
    # host) with GRAFT_SIDECAR_SELFCHECK=0 — the notice still prints.
    selfcheck_sf = os.environ.get("GRAFT_SIDECAR_SELFCHECK_SF",
                                  "/root/testdata/sf0.01")
    for route, tool in ((mh_route, "minhash_oracle.py"),
                        (lm_route, "lm_oracle.py"),
                        (span_route, "span_oracle.py")):
        if not route:
            continue
        print(f"NOTICE: sidecar oracle active ({tool}) for "
              f"{sorted(route)} — re-spelled SQL, not the committed "
              f"oracle_sql.json spellings")
        if os.environ.get("GRAFT_SIDECAR_SELFCHECK", "1") != "1":
            print(f"NOTICE: {tool} selfcheck SKIPPED "
                  f"(GRAFT_SIDECAR_SELFCHECK=0)")
            continue
        if not os.path.isdir(selfcheck_sf):
            print(f"ABORT: {tool} selfcheck SF missing: {selfcheck_sf} — "
                  f"set GRAFT_SIDECAR_SELFCHECK_SF to a small-SF dir on "
                  f"this host, or GRAFT_SIDECAR_SELFCHECK=0 to opt out")
            sys.exit(2)
        try:
            r = subprocess.run(
                [sys.executable, f"tools/{tool}", "--selfcheck", selfcheck_sf,
                 f"{out_dir}/oracle_sql.json"],
                capture_output=True, text=True,
                timeout=int(os.environ.get("GRAFT_SELFCHECK_TIMEOUT", "1800")))
        except subprocess.TimeoutExpired:
            print(f"ABORT: {tool} selfcheck timed out at {selfcheck_sf} — "
                  f"sidecar verdicts would be untrusted")
            sys.exit(2)
        if r.returncode != 0:
            sys.stdout.write(r.stdout)
            sys.stdout.write(r.stderr[-2000:] if r.stderr else "")
            print(f"ABORT: {tool} selfcheck failed at {selfcheck_sf} — "
                  f"sidecar verdicts would be untrusted")
            sys.exit(2)
        print(f"NOTICE: {tool} selfcheck OK at {selfcheck_sf} "
              f"(vs this dump's committed oracle_sql.json)")
    duck = [n for n in names if n not in SIDE_CAR
            and n not in lm_route and n not in mh_route
            and n not in span_route]
    failed = []
    for i in range(0, len(duck), chunk):
        part = duck[i:i + chunk]
        r = subprocess.run(
            [sys.executable, "tools/check.py", sf_dir, out_dir, ",".join(part)],
            capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            failed += [l.split()[1].rstrip(":") for l in r.stdout.splitlines()
                       if l.startswith("FAIL")]
            if r.stderr:
                sys.stdout.write(r.stderr[-2000:])
    if mh_route:
        r = subprocess.run(
            [sys.executable, "tools/minhash_oracle.py", sf_dir, out_dir,
             ",".join(sorted(mh_route))],
            capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            failed += [l.split()[1].rstrip(":") for l in r.stdout.splitlines()
                       if l.startswith("FAIL")] or ["minhash_sidecar"]
            if r.stderr:
                sys.stdout.write(r.stderr[-2000:])
    if lm_route:
        r = subprocess.run(
            [sys.executable, "tools/lm_oracle.py", sf_dir, out_dir,
             ",".join(sorted(lm_route))],
            capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            failed += [l.split()[1].rstrip(":") for l in r.stdout.splitlines()
                       if l.startswith("FAIL")] or ["lm_sidecar"]
            if r.stderr:
                sys.stdout.write(r.stderr[-2000:])
    if span_route:
        r = subprocess.run(
            [sys.executable, "tools/span_oracle.py", sf_dir, out_dir,
             ",".join(sorted(span_route))],
            capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            failed += [l.split()[1].rstrip(":") for l in r.stdout.splitlines()
                       if l.startswith("FAIL")] or ["span_sidecar"]
            if r.stderr:
                sys.stdout.write(r.stderr[-2000:])
    if any(n in SIDE_CAR for n in names):
        r = subprocess.run(
            [sys.executable, "tools/embed_oracle.py", sf_dir, out_dir],
            capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            failed.append("embed_sidecar")
            if r.stderr:
                sys.stdout.write(r.stderr[-2000:])
    print(f"\nTOTAL: {len(names) - len(failed)}/{len(names)} queries match")
    if failed:
        print(f"failed: {sorted(set(failed))}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
