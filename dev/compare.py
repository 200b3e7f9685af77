#!/usr/bin/env python3
"""Dev-loop twin of the driver's correctness gate: run `graft.Verify` first
(`sbt "runMain graft.Verify <sfDir> <outDir> [names]"`), then this script
DuckDB-executes each oracle_sql.json entry against the same sf parquet tables
and diffs it with the Verify parquet dump — columns sorted by name, rows
sorted by all columns, values stringified — the same normalization the
driver hashes. Usage: dev/compare.py <sfDir> <outDir> [name ...]
"""
import json, os, sys
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        print(f"{name}: MISSING spark dump")
        fails += 1
        continue
    try:
        o = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        fails += 1
        continue
    s = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    o, s = o[sorted(o.columns)], s[sorted(s.columns)]
    if list(o.columns) != list(s.columns):
        print(f"{name}: SCHEMA {list(s.columns)} vs oracle {list(o.columns)}")
        fails += 1
        continue
    norm = lambda df: sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False))
    no, ns = norm(o), norm(s)
    if no != ns:
        fails += 1
        diff = [(a, b) for a, b in zip(no, ns) if a != b][:3]
        print(f"{name}: VALUES differ rows={len(ns)}/{len(no)} first={diff}")
    else:
        print(f"{name}: OK ({len(ns)} rows)")
sys.exit(1 if fails else 0)
