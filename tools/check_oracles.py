#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir> [query...]

Reads each <out_dir>/<name> parquet (Spark result), runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the sf_dir
tables, and compares: schema (column names sorted), row count, and a
hash of all values (columns sorted by name, rows sorted by all
columns). The compare is TYPE-SENSITIVE, like the driver's: column
types as reported by DuckDB must match between the Spark parquet read
and the oracle result (this is what catches HUGEINT-vs-BIGINT sum()
mismatches that value-only hashing is blind to), and floats hash at
full repr precision (queries must be bit-exact by construction).
"""
import sys, json, glob, os, math, hashlib

import duckdb

# The oracle SQL encodes THIS DuckDB version's behavior (HUGEINT
# typing of integer aggregates, list_reduce's no-init fold, the
# "exp never crosses the boundary" rule, generate_series constraints
# — see .claude/skills/verify/SKILL.md). A silent image upgrade
# would surface as dozens of mysterious hash drifts; fail loudly
# instead. Recorded in BASELINE.md ("Oracle environment pin");
# override via GRAFT_DUCKDB_EXPECTED only after re-certifying.
EXPECTED_DUCKDB = os.environ.get("GRAFT_DUCKDB_EXPECTED", "1.0.0")
if duckdb.__version__ != EXPECTED_DUCKDB:
    sys.exit(
        f"check_oracles: DuckDB {duckdb.__version__} != pinned "
        f"{EXPECTED_DUCKDB}. The oracle rules are version-calibrated; "
        "re-certify (Verify + full check at sf0.01 and sf0.1), then "
        "update the pin here and in BASELINE.md, or set "
        "GRAFT_DUCKDB_EXPECTED to bypass for a one-off run.")

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "b:%d" % v
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return "f:%r" % v
    if isinstance(v, int):
        return "i:%d" % v
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return "s:" + str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Resource governance for PARALLEL sweeps (round 12): DuckDB's
    # default memory_limit is 80% of RAM *per process*, so several
    # concurrent heavy truth sides plus a 32g Spark JVM invite the
    # kernel OOM-killer (it took down the first sf10 sweep). Both
    # knobs default to DuckDB's own defaults when the env is unset,
    # so single-process driver runs are unchanged.
    if os.environ.get("GRAFT_DUCKDB_MEMLIMIT"):
        con.sql(f"PRAGMA memory_limit='{os.environ['GRAFT_DUCKDB_MEMLIMIT']}'")
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.sql(f"PRAGMA threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    # Spill isolation for parallel sweeps: DuckDB's default temp dir is
    # cwd-relative `.tmp`, so concurrent checker processes would write
    # the SAME numbered spill files (corruption risk) and orphaned
    # spill from a killed process silently eats the disk. Give each
    # process its own directory when sharding a sweep.
    if os.environ.get("GRAFT_DUCKDB_TMPDIR"):
        os.makedirs(os.environ["GRAFT_DUCKDB_TMPDIR"], exist_ok=True)
        con.sql(f"PRAGMA temp_directory='{os.environ['GRAFT_DUCKDB_TMPDIR']}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    # A requested query with no dump directory is a FAILURE, not a
    # silent skip (ADVICE r14): a garbled/renamed name in a retry or
    # spot-check invocation would otherwise yield "PASS 0 / FAIL 0"
    # and a green gate that checked nothing.
    for q in sorted(only - set(names)):
        print(f"  FAIL {q}: no dump directory under {out_dir}")
        n_fail += 1
    # The symmetric hole: graft.Verify swallows per-query exceptions
    # (it logs to stderr and keeps sweeping) and writes oracle_sql.json
    # LAST — so a query that failed during Verify has an oracle entry
    # but no dump dir, and a full sweep would otherwise report
    # "PASS 273 / FAIL 0": a green gate missing a broken query. Only
    # enforced on full sweeps; `only` invocations check their own set.
    if not only:
        for q in sorted(set(oracle) - set(names)):
            print(f"  FAIL {q}: oracle SQL present but no dump directory "
                  f"(query failed or skipped during Verify?)")
            n_fail += 1
    # per-query wall time (GRAFT_ORACLE_TIMES=1): the sf1 sweep's cost
    # lives in a few oracles — this is how they get found
    show_times = os.environ.get("GRAFT_ORACLE_TIMES") == "1"
    import time as _time
    for name in names:
        if only and name not in only:
            continue
        _t0 = _time.time()
        # The engine-side read gets the same try discipline as the
        # oracle side: an empty or corrupt dump dir (aborted Verify)
        # must FAIL that query and keep sweeping, not crash the whole
        # checker and leave a truncated log with no summary line.
        try:
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                raise RuntimeError("no parquet files in dump dir")
            res = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols, srows = list(res.columns), res.fetchall()
            stypes = [str(t) for t in res.types]
        except Exception as e:
            print(f"  FAIL {name}: engine dump read error: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"  ?? {name}: no oracle (rows={len(srows)})")
            n_noracle += 1
            continue
        try:
            ores = con.sql(oracle[name])
            ocols, orows = list(ores.columns), ores.fetchall()
            otypes = [str(t) for t in ores.types]
        except Exception as e:
            print(f"  FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok_schema = sorted(scols) == sorted(ocols)
        ok_types = ok_schema and \
            [t for _, t in sorted(zip(scols, stypes))] == \
            [t for _, t in sorted(zip(ocols, otypes))]
        ok_rows = len(srows) == len(orows)
        ok_hash = ok_schema and ok_types and ok_rows and \
            table_hash(scols, srows) == table_hash(ocols, orows)
        if ok_hash:
            suffix = f" [{_time.time() - _t0:.1f}s]" if show_times else ""
            print(f"  ok   {name} ({len(srows)} rows){suffix}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  FAIL {name}: schema={ok_schema} types={ok_types} rows={len(srows)}vs{len(orows)} hash={ok_hash}")
            if not ok_schema:
                print(f"       spark  cols: {sorted(scols)}")
                print(f"       oracle cols: {sorted(ocols)}")
            elif not ok_types:
                sm = dict(zip(scols, stypes)); om = dict(zip(ocols, otypes))
                for c in sorted(scols):
                    if sm[c] != om[c]:
                        print(f"       type diff {c}: spark={sm[c]} oracle={om[c]}")
            elif len(srows) and len(orows):
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
                lo = sorted("|".join(canon(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"       first diff:\n       spark : {a[:300]}\n       oracle: {b[:300]}")
                        break
    print(f"PASS {n_pass} / FAIL {n_fail} / NO-ORACLE {n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
