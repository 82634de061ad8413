#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>
Reads <verify_out_dir>/<name>/ (Spark parquet) + oracle_sql.json, runs each
oracle in DuckDB against <sf_dir>/*.parquet views, and compares row counts,
sorted-by-name schemas, and value hashes.
"""
import sys, json, glob, os
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            orc = con.execute(sql)
            o_cols = [d[0] for d in orc.description]
            o_rows = orc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        src = con.execute(f"SELECT * FROM read_parquet({files!r})")
        s_cols = [d[0] for d in src.description]
        s_rows = src.fetchall()
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: schema {sorted(s_cols)} vs oracle {sorted(o_cols)}")
            n_bad += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows {len(s_rows)} vs oracle {len(o_rows)}")
            n_bad += 1
            continue
        h_s = table_hash(s_rows, s_cols)
        h_o = table_hash(o_rows, o_cols)
        if h_s != h_o:
            print(f"FAIL {name}: hash mismatch ({len(s_rows)} rows)")
            # print first diffs
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            a = sorted("\x01".join(norm(r[i]) for i in order) for r in s_rows)
            b = sorted("\x01".join(norm(r[i]) for i in order) for r in o_rows)
            shown = 0
            for x, y in zip(a, b):
                if x != y and shown < 3:
                    print(f"  spark:  {x[:160]}")
                    print(f"  oracle: {y[:160]}")
                    shown += 1
            n_bad += 1
        else:
            print(f"OK   {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
