#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle differential check.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name>/ parquet result (Spark side), runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the sf tables,
canonicalizes both (column-name sort, row sort, float rounding) and compares.
Driver-side tooling only — the Scala library never depends on this.
"""
import json, os, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif math.isinf(v):
                    v = "Inf" if v > 0 else "-Inf"
                else:
                    v = f"{v:.6g}"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # GenData fixtures are directories of part files (and store
        # events.ts as a nanos LONG, like Tables.load consumes it).
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p += "/*.parquet"
        if t == "events":
            typ = con.execute(
                f"SELECT typeof(ts) FROM '{p}' LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                con.execute(
                    "CREATE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM '{p}'")
                continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        # One execution per side: rows AND pandas dtype kinds both come off
        # the same DataFrame (re-running heavy oracles just for .dtypes
        # doubled the gate's runtime). The dtype-kind check replicates the
        # driver's canonicalizer behavior: a HUGEINT oracle column becomes
        # float64 in pandas ('5.0') while the Spark parquet column stays
        # int64 ('5') — same values, different rendering, hash mismatch.
        try:
            s_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            s_cols = list(s_df.columns)
            s_rows = [tuple(r) for r in s_df.itertuples(index=False, name=None)]
            d_df = con.execute(sql).df()
            d_cols = list(d_df.columns)
            d_rows = [tuple(r) for r in d_df.itertuples(index=False, name=None)]
            s_kinds = [d.kind for d in s_df.dtypes]
            d_kinds = [d.kind for d in d_df.dtypes]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        if s_kinds is not None and sorted(zip(s_cols, s_kinds)) != sorted(
                zip(d_cols, d_kinds)):
            print(f"FAIL {name}: pandas dtype kinds differ "
                  f"spark={sorted(zip(s_cols, s_kinds))} "
                  f"duck={sorted(zip(d_cols, d_kinds))}")
            n_fail += 1
        elif sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
        elif sr != dr:
            diff_a = [r for r in sr if r not in set(dr)][:3]
            diff_b = [r for r in dr if r not in set(sr)][:3]
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}\n"
                  f"  spark-only: {diff_a}\n  duck-only:  {diff_b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
