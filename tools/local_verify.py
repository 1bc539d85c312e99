#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run graft.Verify
output against the DuckDB oracle SQL and diff. Usage:
  python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
(Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran.)
"""
import duckdb, json, sys, glob, os, math

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, okays = [], []
for name in sorted(oracle):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "no spark output")); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
        gcols = [d[0] for d in con.description]
        exp = con.execute(oracle[name]).fetchall()
        ecols = [d[0] for d in con.description]
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    if sorted(gcols) != sorted(ecols):
        fails.append((name, f"schema: spark={sorted(gcols)} oracle={sorted(ecols)}")); continue
    # the DRIVER canonicalizes via pandas, which cannot hash ARRAY cells
    # (round-8 q111/q112 crash) — flag any list/ndarray cell up front so
    # a declared output that would crash the driver fails HERE too
    unhashable = None
    for probe_rows, side in ((got, "spark"), (exp, "oracle")):
        for r in probe_rows:
            for v in r:
                if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                    unhashable = f"{side} output has an array cell (driver-unhashable): {v!r:.80}"
                    break
            if unhashable: break
        if unhashable: break
    if unhashable:
        fails.append((name, unhashable)); continue
    gperm = sorted(range(len(gcols)), key=lambda i: gcols[i])
    eperm = sorted(range(len(ecols)), key=lambda i: ecols[i])
    got = [tuple(r[i] for i in gperm) for r in got]
    exp = [tuple(r[i] for i in eperm) for r in exp]
    if len(got) != len(exp):
        fails.append((name, f"rows: spark={len(got)} oracle={len(exp)}")); continue
    bad = None
    for i, (g, e) in enumerate(zip(got, exp)):
        for a, b in zip(g, e):
            same = (a == b)
            if not same and isinstance(a, float) and isinstance(b, float):
                same = (math.isnan(a) and math.isnan(b)) or a == b
            if not same:
                bad = (i, g, e); break
        if bad: break
    if bad:
        fails.append((name, f"value mismatch at row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}"))
    else:
        okays.append((name, len(got)))

for n, c in okays: print(f"PASS {n} ({c} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(okays)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
