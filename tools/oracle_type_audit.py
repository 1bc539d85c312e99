#!/usr/bin/env python3
"""Oracle output-type discipline audit (round-12 verdict task 2).

The q169 family was driver-hash-red for four rounds because its oracle's
`batch_idx` derived from a DuckDB window `sum(BIGINT)` — which returns
HUGEINT (int128) — and reached the final SELECT uncast. A driver whose
DuckDB/Arrow version dtypes/formats int128 differently from the local
replay hashes red with identical values (rows/schema green, hash red).

This tool closes the whole class: it asks DuckDB itself (`DESCRIBE
<oracle sql>`) for every oracle's OUTPUT column types and fails on any
type outside the cross-version-stable allowlist. DuckDB's own typer is
the authority — no SQL parsing heuristics.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/sqldump --sql-only"
  python3 tools/oracle_type_audit.py /root/testdata/sf0.001 /tmp/sqldump/oracle_sql.json

Exit 0 = every oracle column is a stable type; 1 = violations listed.
"""
import duckdb, json, sys, glob, os, re

# Types whose Arrow/pandas dtype and string formatting are stable across
# the DuckDB versions a driver might run (the q169 lesson: HUGEINT is not).
ALLOWED = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",  # int64/32/16/8 — exact
    "DOUBLE", "FLOAT",                            # ieee754 — exact dtype
    "VARCHAR", "BOOLEAN", "DATE",
    "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS",
    "BLOB",
}
# Explicitly banned with the reason shown in the failure message.
BANNED_WHY = {
    "HUGEINT": "int128 — Arrow dtype/format varies by DuckDB version (the q169 4-round hash-red)",
    "UHUGEINT": "uint128 — same int128 hazard as HUGEINT",
    "UBIGINT": "uint64 — pandas dtype flips object/uint64 across versions",
}

def main():
    sfdir, sqljson = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(sqljson))
    bad, census = [], {}
    for name in sorted(oracle):
        try:
            rows = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            bad.append((name, f"DESCRIBE failed: {e}"))
            continue
        for col, typ, *_ in rows:
            # normalize parameterized types: DECIMAL(18,6) -> DECIMAL
            base = re.sub(r"\(.*\)$", "", typ).strip()
            census[base] = census.get(base, 0) + 1
            if base in BANNED_WHY:
                bad.append((name, f"column `{col}` is {typ}: {BANNED_WHY[base]}"))
            elif base not in ALLOWED and not base.endswith("[]"):
                bad.append((name, f"column `{col}` is {typ}: not in the stable-type allowlist"))
            elif base.endswith("[]"):
                # arrays are driver-unhashable anyway; local_verify flags them
                bad.append((name, f"column `{col}` is {typ}: array output is driver-unhashable"))
    print("type census:", json.dumps(census, sort_keys=True))
    for n, m in bad:
        print(f"FAIL {n}: {m}")
    print(f"\n{len(oracle)} oracles audited, {len(bad)} violations")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
