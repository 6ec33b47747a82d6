#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Reads <outDir>/<name>/ parquet (Spark results) + <outDir>/oracle_sql.json,
runs each oracle SQL in DuckDB against the sf tables, and compares:
row count, column names (sorted), and a hash over sorted rows with
columns sorted by name.
"""
import os, sys, json, glob, hashlib
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # repr of the double — both engines must produce the identical double
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver SF dirs are single files; generated ones (ScaleGen's
        # sf1) are Spark-written DIRECTORIES of part files — DuckDB
        # needs the glob for those
        path = f"{sf_dir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fail += 1
            continue
        try:
            d = con.sql(sql)
            dcols = [c.lower() for c in d.columns]
            # dtype guard: DuckDB silently widens SUM(BIGINT) arithmetic
            # to HUGEINT, which the driver's pandas hasher renders as
            # float ('2520113214.0' != '2520113214') — fail LOUDLY on
            # any oracle column type the hasher can't round-trip
            # (the curate_temperature_mix r10 bug class).
            bad_types = [
                (c, str(t)) for c, t in zip(d.columns, d.types)
                if str(t) == "HUGEINT" or str(t).startswith("DECIMAL")
                or str(t) in ("UHUGEINT",)
            ]
            if bad_types:
                print(f"FAIL {name}: oracle column type(s) unsafe for the "
                      f"pandas hasher — add CAST(... AS BIGINT/DOUBLE): "
                      f"{bad_types}")
                fail += 1
                continue
            drows = d.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            fail += 1
            continue
        sq = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols = [c.lower() for c in sq.columns]
        srows = sq.fetchall()
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not problems and table_hash(srows, scols) != table_hash(drows, dcols):
            problems.append("hash mismatch")
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ls = sorted("\x01".join(canon(r[i]) for i in order_s) for r in srows)
            ld = sorted("\x01".join(canon(r[i]) for i in order_d) for r in drows)
            for a, b in zip(ls, ld):
                if a != b:
                    problems.append(f"first diff:\n  spark={a[:300]}\n  duck ={b[:300]}")
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
