#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output (parquet per query + oracle_sql.json) against DuckDB on the same
fixture tables and compare row counts, schemas, and value hashes.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return out

fails = 0
for name in sorted(oracle):
    res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not res_glob:
        print(f"FAIL {name}: no spark result parquet")
        fails += 1
        continue
    try:
        got_desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
        exp_desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        exp = con.execute(oracle[name]).fetchall()
        exp_cols = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    # exact type equality: the driver's hash is type-sensitive in ways
    # str() comparison is not (e.g. DuckDB HUGEINT -> pandas float64
    # renders 0.0 where spark's BIGINT renders 0) — q42 round-4/5 red.
    gt = {c[0]: c[1] for c in got_desc}
    et = {c[0]: c[1] for c in exp_desc}
    tdiff = [(k, gt.get(k), et.get(k)) for k in set(gt) | set(et)
             if gt.get(k) != et.get(k)]
    if tdiff:
        print(f"FAIL {name}: type mismatch {tdiff}")
        fails += 1
        continue
    # driver sorts columns by name before hashing
    gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
        fails += 1
        continue
    g = canon([tuple(r[i] for i in gi) for r in got])
    e = canon([tuple(r[i] for i in ei) for r in exp])
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}")
        fails += 1
        continue
    if g != e:
        # the driver's hash compare is order-sensitive: an ordering-only
        # mismatch is a real failure, not a warning
        if sorted(g) == sorted(e):
            print(f"FAIL {name}: same multiset, different order ({len(g)} rows)")
            fails += 1
        else:
            bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at rows {bad}")
            for i in bad:
                print(f"   spark: {g[i]}")
                print(f"   duck : {e[i]}")
            fails += 1
        continue
    print(f"OK   {name} ({len(g)} rows)")

queries_only = [d for d in os.listdir(out_dir)
                if os.path.isdir(f"{out_dir}/{d}") and d not in oracle]
for name in sorted(queries_only):
    n = len(glob.glob(f"{out_dir}/{name}/*.parquet")) and con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
    print(f"ROWS {name}: {n} (no oracle)")

print(f"\n{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
