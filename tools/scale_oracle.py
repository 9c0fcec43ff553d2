#!/usr/bin/env python3
"""x10 oracle slice — hash-asserted correctness at scale.

Verifies a subset of SparkEntry queries against the ScaleGen x10 set by
running the same oracle SQL the driver runs (oracle_sql.json, dumped by
graft.Verify) in DuckDB over the scaled parquet tables, then comparing
each Spark parquet result the same way the driver's CORRECTNESS gate
does: row count, schema (column names sorted), and an order-insensitive
value hash.

This is measurement tooling (runs out-of-band, like the driver's own
harness) — the graft library itself has no python or duckdb dependency.

Usage: python3 tools/scale_oracle.py <sfDir> <verifyOutDir> <out.json>
  <sfDir>        scaled tables (.scale/sf1), <table>.parquet file or dir
  <verifyOutDir> graft.Verify output: <query>/ parquet dirs + oracle_sql.json
  <out.json>     per-query result map (CORRECTNESS-shaped)
"""
import duckdb
import glob
import hashlib
import json
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def scan_expr(path):
    """parquet_scan target for a file or a Spark part-file directory."""
    if os.path.isdir(path):
        return os.path.join(path, "*.parquet")
    return path


def canonical(rows, cols):
    """(sorted column names, row count, sha256 over column-sorted,
    row-sorted, float-normalized values) — the driver's compare shape."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "%.10g" % v
        if isinstance(v, list):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    canon = sorted(tuple(cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon:
        h.update("\x01".join(r).encode())
        h.update(b"\x02")
    return [cols[i] for i in order], len(rows), h.hexdigest()


def main():
    sf, vout, outp = sys.argv[1:4]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, t + ".parquet")
        if os.path.exists(p):
            con.execute(
                "CREATE VIEW %s AS SELECT * FROM parquet_scan('%s')"
                % (t, scan_expr(p)))
    with open(os.path.join(vout, "oracle_sql.json")) as f:
        oracle = json.load(f)

    results = {}
    for qdir in sorted(glob.glob(os.path.join(vout, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir) or name not in oracle:
            continue
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        try:
            sq = con.execute(
                "SELECT * FROM parquet_scan('%s')" % scan_expr(qdir))
            scols = [d[0] for d in sq.description]
            scols_s, srows, shash = canonical(sq.fetchall(), scols)
            oq = con.execute(oracle[name])
            ocols = [d[0] for d in oq.description]
            ocols_s, orows, ohash = canonical(oq.fetchall(), ocols)
            entry.update(
                spark_rows=srows, oracle_rows=orows,
                rows_match=srows == orows,
                schema_match=scols_s == ocols_s,
                hash_match=shash == ohash)
            if not entry["schema_match"]:
                entry["err"] = "schema: spark=%s oracle=%s" % (
                    scols_s, ocols_s)
        except Exception as e:  # per-query, never fatal
            entry["err"] = str(e)
        results[name] = entry
        print(name, "OK" if entry["hash_match"] else "MISMATCH",
              entry["spark_rows"], entry["err"] or "")

    with open(outp, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    bad = [n for n, e in results.items() if not e["hash_match"]]
    print("checked=%d green=%d red=%s"
          % (len(results), len(results) - len(bad), bad or "none"))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
