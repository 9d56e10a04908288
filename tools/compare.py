#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
tables, sorts columns by name and rows by value, and compares.
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    # Normalize cell values for comparison across engines.
    import datetime, decimal, math
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v!r}"
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)

def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted([os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)])
    for name in names:
        try:
            sp = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(sp_rows)} rows)"
            continue
        try:
            du = con.execute(oracle[name])
            du_cols = [d[0] for d in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {str(e)[:200]}"
            continue
        # Exact engine-level types via DESCRIBE: the driver hashes pandas
        # frames dtype-sensitively, so DECIMAL (-> object of decimal.Decimal
        # from Spark parquet, float64 from DuckDB) and HUGEINT (DuckDB int
        # SUM) in a FINAL projection are hash-fails even when values match.
        def col_types(sql):
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
            return {r[0]: r[1].replace(" WITH TIME ZONE", "") for r in rows}
        try:
            sp_types = col_types(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            du_types = col_types(oracle[name])
        except Exception as e:
            results[name] = f"DESCRIBE-FAIL {str(e)[:200]}"
            continue
        risky = sorted([f"{c}:{t}" for d in (sp_types, du_types) for c, t in d.items()
                        if t.startswith("DECIMAL") or t == "HUGEINT"])
        sc, sr = frame_to_rows(sp_cols, sp_rows)
        dc, dr = frame_to_rows(du_cols, du_rows)
        type_diff = {c: (sp_types.get(c), du_types.get(c)) for c in sc
                     if c in du_types and sp_types.get(c) != du_types.get(c)}
        if risky:
            results[name] = f"DRIVER-DTYPE-RISK {risky}"
        elif sc != dc:
            results[name] = f"SCHEMA-MISMATCH spark={sc} duck={dc}"
        elif type_diff:
            results[name] = f"TYPE-MISMATCH {type_diff}"
        elif len(sr) != len(dr):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(sr)} duck={len(dr)}"
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            results[name] = f"VALUE-MISMATCH first_diffs={diffs}"
        else:
            results[name] = f"OK ({len(sr)} rows)"
    bad = 0
    for name in sorted(results):
        r = results[name]
        flag = "  " if r.startswith("OK") or r.startswith("rows-only") else "XX"
        if flag == "XX":
            bad += 1
        print(f"{flag} {name}: {r[:300]}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
