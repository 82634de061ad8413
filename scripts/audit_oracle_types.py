#!/usr/bin/env python3
"""Audit every oracle's OUTPUT column types in DuckDB.

The r13 q14_promo_effect red row was a typing defect invisible to the
name-only schema compare: DuckDB returns HUGEINT for SUM(BIGINT) and for
`//` over it, which hashes/serializes differently from BIGINT in the
driver's binder while values match. This script DESCRIBEs each oracle
from a Verify outDir's oracle_sql.json and flags any HUGEINT/UHUGEINT
output column (fix: CAST the aggregate/division to BIGINT, the r4 rule).

Usage: python3 scripts/audit_oracle_types.py <verify_outDir> <sfDir>
Exit 0 = clean; 1 = flagged columns or DESCRIBE errors (listed).
"""
import duckdb, json, glob, os, sys

def main():
    if len(sys.argv) < 3:
        print("usage: audit_oracle_types.py <verify_outDir> <sfDir>")
        return 2
    outdir, sfdir = sys.argv[1], sys.argv[2]
    sql = json.load(open(os.path.join(outdir, 'oracle_sql.json')))
    con = duckdb.connect()
    for pq in glob.glob(f'{sfdir}/*.parquet'):
        t = os.path.basename(pq).replace('.parquet', '')
        # quoted identifier: a filename stem need not be a bare SQL name
        con.execute(
            f"CREATE VIEW \"{t}\" AS SELECT * FROM read_parquet('{pq}')")
    bad = []
    for name, q in sorted(sql.items()):
        try:
            cols = con.execute(f"DESCRIBE SELECT * FROM ({q}) t").fetchall()
            hug = [(c[0], c[1]) for c in cols if 'HUGEINT' in c[1].upper()]
            if hug:
                bad.append((name, hug))
        except Exception as e:
            bad.append((name, f"DESCRIBE-ERR {str(e)[:100]}"))
    for b in bad:
        print("FLAG", b)
    print(("clean" if not bad else f"{len(bad)} flagged") + f" of {len(sql)}")
    return 1 if bad else 0

if __name__ == '__main__':
    sys.exit(main())
