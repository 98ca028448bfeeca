#!/usr/bin/env python3
"""Sampled exact oracle audit for qB4_sparse_cosine at sf10.

qB4's full DuckDB truth side is the capped inverted-index pair build
over the whole corpus — its dots GROUP BY state exhausted this host's
temp disk twice at sf10 (>70 GB spill, oracle_sf10_r13_qb4{,b}.log) —
so the full-surface sweep certifies qB4 at sf0.01/sf0.1/sf1 and THIS
audit covers sf10, the q44 discipline (tools/audit_q44_sf10.py):

  truth  = exact DuckDB evaluation of qB4's DEFINED semantics — the
           corpus-relative df cap max(200, n_docs // 250) computed on
           the FULL corpus, norms in the surviving subspace over the
           FULL corpus, cosine = dot / sqrt(n2a * n2b) with the
           HUGEINT-safe product — for every pair whose LOWER doc_id
           (d1) lands in the deterministic 8192-doc md5 sample. The
           sampled d1 side bounds the pair build to ~1.6% of the full
           join volume, which fits this host; the cap, df, and norms
           are NOT sampled, so each audited pair's score is exactly
           the full query's.
  engine = the committed sf10 Verify dump filtered to the same d1
           sample.

Any dropped, invented, or mis-scored pair (dot integer-exact, cos
repr-exact — the bit-identical float path certified at sf1) whose d1
lands in the sample fails the audit; duplicates on either side fail
loudly. The sample is partition- and engine-invariant, so the check
is reproducible. NOTE the distinction from DIAG_B4: that artifact
measures the cap's RECALL against the uncapped full-space cosine
(a semantics-design question); this one certifies the engine computes
the capped semantics CORRECTLY (an implementation question).

Usage: python3 tools/audit_qb4_sf10.py <verify_out_dir> <sf_dir>
Prints one JSON line (committed as DIAG_B4_ORACLE.json).
"""
import glob
import json
import os
import sys

import duckdb

SAMPLE = 8192
DF_CAP_FLOOR = 200   # keep in lockstep with DedupSim.QB4DfCap
DF_CAP_DENOM = 250   # ... and DedupSim.QB4DfDenom

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.sql(f"PRAGMA memory_limit='{os.environ.get('GRAFT_DUCKDB_MEMLIMIT', '40GB')}'")
if os.environ.get("GRAFT_DUCKDB_THREADS"):
    con.sql(f"PRAGMA threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
if os.environ.get("GRAFT_DUCKDB_TMPDIR"):
    os.makedirs(os.environ["GRAFT_DUCKDB_TMPDIR"], exist_ok=True)
    con.sql(f"PRAGMA temp_directory='{os.environ['GRAFT_DUCKDB_TMPDIR']}'")
    # the audit is sized to fit; a bug must error out, not fill the disk
    con.sql("SET max_temp_directory_size='60GB'")
con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
files = glob.glob(f"{out_dir}/qB4_sparse_cosine/*.parquet")
con.sql(f"CREATE VIEW spark_out AS SELECT * FROM read_parquet({files!r})")

truth = con.sql(f"""
WITH samp AS (
  SELECT doc_id FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {SAMPLE}),
t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (
  SELECT doc_id, u.g AS g
  FROM t, unnest(CASE WHEN len(w) >= 3
    THEN [array_to_string(w[i:i+2], ' ')
          for i in generate_series(1, len(w) - 2)]
    ELSE [] END) AS u(g)),
tf AS (
  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf
  FROM s GROUP BY doc_id, g),
-- surviving dims: FULL-corpus df under the corpus-relative cap,
-- same integer formula as the engine and the full oracle
dims AS (
  SELECT g FROM tf GROUP BY g
  HAVING count(*) <= greatest({DF_CAP_FLOOR},
    (SELECT count(*) // {DF_CAP_DENOM} FROM documents))),
pruned AS (SELECT tf.* FROM tf JOIN dims USING (g)),
-- norms over the surviving subspace, FULL corpus (not sampled)
norms AS (
  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
  FROM pruned GROUP BY doc_id),
-- pair build bounded to sampled LOWER endpoints: d1 ∈ samp, d2 any
dots AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
    CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
  FROM pruned a
  JOIN samp ON a.doc_id = samp.doc_id
  JOIN pruned b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT d1, d2, dot,
  CAST(dot AS DOUBLE)
    / sqrt(CAST(CAST(x.n2 AS HUGEINT) * y.n2 AS DOUBLE)) AS cos
FROM dots
JOIN norms x ON x.doc_id = d1
JOIN norms y ON y.doc_id = d2
WHERE CAST(dot AS DOUBLE)
  / sqrt(CAST(CAST(x.n2 AS HUGEINT) * y.n2 AS DOUBLE)) >= 0.5
""").fetchall()

spark = con.sql(f"""
WITH samp AS (
  SELECT doc_id FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {SAMPLE})
SELECT d1, d2, dot, cos FROM spark_out
JOIN samp ON spark_out.d1 = samp.doc_id
""").fetchall()

def key(rows, side):
    d = {(r[0], r[1]): (r[2], repr(r[3])) for r in rows}
    # dict construction silently collapses duplicate (d1,d2) rows —
    # a doubled pair on either side must FAIL, not vanish
    if len(d) != len(rows):
        sys.exit(f"audit_qb4: {side} emitted {len(rows) - len(d)} "
                 f"duplicate (d1,d2) rows — not a set")
    return d

t, s = key(truth, "truth"), key(spark, "spark")
missing = [k for k in t if k not in s]
invented = [k for k in s if k not in t]
score_mismatch = [k for k in t if k in s and t[k] != s[k]]
# A zero-pair audit is VACUOUS, not green (0 == 0 would "pass" on an
# empty/mispointed dump or a broken documents view): every real SF
# yields thousands of sampled pairs (sf1: 4,535; sf10: 42,283).
ok = bool(t) and not missing and not invented and not score_mismatch
print(json.dumps({
    "diag": "qB4_sf10_sampled_oracle", "sample_docs": SAMPLE,
    "df_cap_formula": f"max({DF_CAP_FLOOR}, n_docs // {DF_CAP_DENOM})",
    "sf_dir": sf_dir, "truth_pairs": len(t), "spark_pairs": len(s),
    "missing": len(missing), "invented": len(invented),
    "score_mismatch": len(score_mismatch), "pass": ok}))
sys.exit(0 if ok else 1)
