#!/usr/bin/env python3
"""Sampled exact oracle audit for q44_jaccard_pairs at sf10.

q44's full DuckDB truth side is all-pairs with per-pair list scans —
O(n² · |s|), measured >1.5 h single-core at sf10 before being killed,
so the full-surface sweep certifies q44 at sf0.01/sf0.1/sf1 and THIS
audit covers sf10: exact truth for every pair whose LOWER doc_id is
in the deterministic 8192-doc md5 sample (the q132 discipline),
computed feasibly via a token equi-join (J ≥ t pairs must share a
token, and the join itself counts the intersection — no per-pair list
scans), compared against the engine's UNBOUNDED output filtered to
the same sample. Any dropped, invented, or mis-scored pair whose id1
lands in the sample fails the audit; the sample is partition- and
engine-invariant, so the check is reproducible.

Usage: python3 tools/audit_q44_sf10.py <verify_out_dir> <sf_dir>
Prints one JSON line (committed as DIAG_Q44_ORACLE.json).
"""
import glob
import json
import os
import sys

import duckdb

SAMPLE = 8192
THRESH = 0.8

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# Same resource-governance knobs as check_oracles.py (ADVICE r12):
# a hardcoded 40GB limit + cwd-relative .tmp spill would collide with
# parallel sweep shards and ignore the per-shard budget the sweep sets.
con.sql(f"PRAGMA memory_limit='{os.environ.get('GRAFT_DUCKDB_MEMLIMIT', '40GB')}'")
if os.environ.get("GRAFT_DUCKDB_THREADS"):
    con.sql(f"PRAGMA threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
if os.environ.get("GRAFT_DUCKDB_TMPDIR"):
    os.makedirs(os.environ["GRAFT_DUCKDB_TMPDIR"], exist_ok=True)
    con.sql(f"PRAGMA temp_directory='{os.environ['GRAFT_DUCKDB_TMPDIR']}'")
con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
files = glob.glob(f"{out_dir}/q44_jaccard_pairs/*.parquet")
con.sql(f"CREATE VIEW spark_out AS SELECT * FROM read_parquet({files!r})")

truth = con.sql(f"""
WITH samp AS (
  SELECT doc_id FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {SAMPLE}),
d AS (
  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS s
  FROM documents),
sz AS (SELECT doc_id, len(s) AS sz FROM d),
toks AS (
  SELECT doc_id, source, t.tok
  FROM d, unnest(s) AS t(tok)),
cand AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
    any_value(a.source) AS bkt, count(*) AS inter
  FROM toks a
  JOIN samp ON a.doc_id = samp.doc_id
  JOIN toks b ON a.tok = b.tok AND a.source = b.source
             AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT c.bkt, c.id1, c.id2,
  CAST(c.inter AS DOUBLE) / (sa.sz + sb.sz - c.inter) AS jaccard
FROM cand c
JOIN sz sa ON sa.doc_id = c.id1
JOIN sz sb ON sb.doc_id = c.id2
WHERE CAST(c.inter AS DOUBLE) / (sa.sz + sb.sz - c.inter) >= {THRESH}
""").fetchall()

spark = con.sql(f"""
WITH samp AS (
  SELECT doc_id FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {SAMPLE})
SELECT bkt, id1, id2, jaccard FROM spark_out
JOIN samp ON spark_out.id1 = samp.doc_id
""").fetchall()

def key(rows, side):
    d = {(r[0], r[1], r[2]): r[3] for r in rows}
    # dict construction silently collapses duplicate (bkt,id1,id2)
    # rows — a doubled pair on either side must FAIL, not vanish
    if len(d) != len(rows):
        sys.exit(f"audit_q44: {side} emitted {len(rows) - len(d)} "
                 f"duplicate (bkt,id1,id2) rows — not a set")
    return d

t, s = key(truth, "truth"), key(spark, "spark")
missing = [k for k in t if k not in s]
invented = [k for k in s if k not in t]
score_mismatch = [k for k in t if k in s and repr(t[k]) != repr(s[k])]
# A zero-pair audit is VACUOUS, not green (0 == 0 would "pass" on an
# empty/mispointed dump or a broken documents view): every real SF
# yields six-figure sampled pair counts (sf10: 891,073).
ok = bool(t) and not missing and not invented and not score_mismatch
print(json.dumps({
    "diag": "q44_sf10_sampled_oracle", "sample_docs": SAMPLE,
    "sf_dir": sf_dir, "truth_pairs": len(t), "spark_pairs": len(s),
    "missing": len(missing), "invented": len(invented),
    "score_mismatch": len(score_mismatch), "pass": ok}))
sys.exit(0 if ok else 1)
