#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the sf parquet tables and compare with the Verify parquet dumps
(columns sorted by name, values hashed)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in ["documents", "embeddings", "lineitem", "orders", "customer",
          "supplier", "part", "nation", "region", "events"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        results[name] = "NO_OUTPUT"
        continue
    got = duckdb.sql(f"SELECT * FROM read_parquet({files!r})").df()
    if name not in oracle:
        results[name] = f"ROWS_ONLY({len(got)})"
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    got2 = got.reindex(sorted(got.columns), axis=1)
    exp2 = exp.reindex(sorted(exp.columns), axis=1)
    if list(got2.columns) != list(exp2.columns):
        results[name] = f"SCHEMA_MISMATCH got={list(got2.columns)} exp={list(exp2.columns)}"
        continue
    if len(got2) != len(exp2):
        results[name] = f"ROWCOUNT got={len(got2)} exp={len(exp2)}"
        continue
    # normalize dtypes: ints -> int64, floats -> float64 rounded to 6
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == object and all(
                    isinstance(v, int) for v in df[c].dropna().head(3)):
                try:
                    df[c] = df[c].astype("int64")
                except Exception:
                    pass
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].round(6)
        return df.reset_index(drop=True)
    g, e = norm(got2), norm(exp2)
    eq = g.equals(e)
    if not eq:
        diff = (g != e)
        ndiff = int(diff.to_numpy().sum())
        # show first mismatching rows
        idx = diff.any(axis=1)
        sample = pd.concat([g[idx].head(3).add_suffix("_got"),
                            e[idx].head(3).add_suffix("_exp")], axis=1)
        results[name] = f"VALUE_MISMATCH cells={ndiff}\n{sample}"
    else:
        results[name] = f"OK({len(g)})"

bad = 0
for k, v in results.items():
    flag = "  " if str(v).startswith(("OK", "ROWS_ONLY")) else "XX"
    if flag == "XX":
        bad += 1
    print(f"{flag} {k}: {v}")
print(f"\n{len(results)} queries, {bad} failing")
sys.exit(1 if bad else 0)
