#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet
tables and compare row count, schema (sorted column names), and a
value hash (rows sorted, columns sorted by name, floats rounded)."""
import json, sys, glob, os
import duckdb, pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    import hashlib
    return hashlib.md5("\x02".join(out).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    # a --keys dev run writes its filtered map to the sibling subset
    # file (oracle_sql.json always carries the full map); prefer it so
    # partial dumps check cleanly without flagging the other keys MISS
    subset = f"{out_dir}/oracle_sql_subset.json"
    oracle = json.load(open(subset if os.path.exists(subset)
                            else f"{out_dir}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        if not os.path.isdir(pdir):
            print(f"MISS  {name}: no spark output"); fails.append(name); continue
        try:
            spark_tbl = pq.read_table(pdir)
        except Exception as e:
            print(f"READ  {name}: {e}"); fails.append(name); continue
        try:
            duck = con.execute(sql)
            drows = duck.fetchall()
            dcols = [c[0] for c in duck.description]
        except Exception as e:
            print(f"DUCK  {name}: {e}"); fails.append(name); continue
        scols = spark_tbl.column_names
        srows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
        if sorted(scols) != sorted(dcols):
            print(f"SCHEMA {name}: spark={sorted(scols)} duck={sorted(dcols)}")
            fails.append(name); continue
        if len(srows) != len(drows):
            print(f"ROWS  {name}: spark={len(srows)} duck={len(drows)}")
            fails.append(name); continue
        hs, hd = canon(srows, scols), canon(drows, dcols)
        if hs != hd:
            print(f"HASH  {name}: mismatch ({len(srows)} rows)")
            fails.append(name)
        else:
            print(f"OK    {name} ({len(srows)} rows)")
    print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
