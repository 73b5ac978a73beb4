#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

<verifyOutDir> is what `sbt "runMain graft.Verify <sfDir> <outDir>"` wrote:
one parquet dir per query plus oracle_sql.json. For each query with an
oracle, run the SQL in DuckDB against views over the sf tables and compare
against the Spark result: columns sorted by name, rows sorted, values equal
(exact; floats compared to 1e-9 relative just to report *how* they differ).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"SKIP  {name}: no spark output")
            n_skip += 1
            continue
        try:
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        s_cols = [d[0] for d in s.description]
        s_rows = s.fetchall()
        oc, orows = normalize(o_rows, o_cols)
        sc, srows = normalize(s_rows, s_cols)
        if oc != sc:
            print(f"FAIL  {name}: columns differ: spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL  {name}: row count spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL  {name}: first diff at sorted row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip")
    return 1 if n_fail or n_skip else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
