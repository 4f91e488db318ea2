#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same sf dir, compare to the Verify parquet dumps.
Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [queryName ...]
Extra args restrict the check to those query names.
"""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"read/exec error: {e}"))
        continue
    ec = sorted(exp.columns); gc = sorted(got.columns)
    if ec != gc:
        fails.append((name, f"columns differ: oracle={ec} got={gc}"))
        continue
    # The driver's hasher is value-representation-sensitive (decimal precision
    # divergence fails it even when values agree) — surface dtype skew early.
    dk = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in ec
          if exp[c].dtype != got[c].dtype]
    if dk:
        print(f"WARN {name}: dtype skew oracle-vs-spark: {dk}")
    exp = exp[ec].sort_values(by=ec, ignore_index=True)
    got = got[gc].sort_values(by=gc, ignore_index=True)
    if len(exp) != len(got):
        fails.append((name, f"rowcount differ: oracle={len(exp)} got={len(got)}"))
        continue
    bad = None
    for c in ec:
        a, b = exp[c], got[c]
        try:
            import pandas as pd
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                ok = all(math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9) or (pd.isna(x) and pd.isna(y))
                         for x, y in zip(a, b))
            else:
                ok = all((str(x) == str(y)) or (pd.isna(x) and pd.isna(y)) for x, y in zip(a, b))
        except Exception as e:
            ok = False
        if not ok:
            mism = [(i, a[i], b[i]) for i in range(len(a))
                    if str(a[i]) != str(b[i])][:3]
            bad = f"col {c} differs, e.g. {mism}"
            break
    if bad: fails.append((name, bad))
    else: print(f"OK   {name} ({len(exp)} rows)")

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
