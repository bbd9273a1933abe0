#!/usr/bin/env python3
"""Dev-only mimic of the driver's t2 correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each
<name>.parquet the Verify dump wrote, runs the matching oracle SQL from
oracle_sql.json in DuckDB against the same sf directory, and compares
(rows, schema names, sorted-value hash). Not part of the engine.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

# DuckDB output types the driver's hasher may encode differently than
# the engine's int64/float64/varchar parquet output. An oracle whose
# final projection DESCRIBEs to one of these passed the old numpy-
# coerced value compare while failing the driver's hash gate for two
# rounds (HUGEINT from SUM(BIGINT) — see VERDICT.md r10 §What's wrong).
# DECIMAL is NOT banned: r1's DECIMAL(2,1) scores are driver-green
# (engine emits the matching decimal) — the int128/unsigned family is
# the class pandas/the driver represent with no native dtype.
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                       "USMALLINT", "UTINYINT")

def lint_oracle_types(con, name: str, sql: str):
    """Hard-fail any oracle whose declared output types the driver would
    hash differently than the engine's parquet dump. Returns error or None."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(c, t) for (c, t, *_) in desc
           if any(t.upper().startswith(b) for b in BANNED_ORACLE_TYPES)]
    if bad:
        return f"oracle emits driver-hostile types {bad} — cast to BIGINT/DOUBLE"
    return None

def dtype_kind(s: pd.Series) -> str:
    k = s.dtype.kind  # i/u int, f float, b bool, O object, M datetime
    if k == "O":
        import decimal
        nn = s.dropna()
        if len(nn) and isinstance(nn.iloc[0], decimal.Decimal):
            return "f"  # parquet decimal -> object(Decimal); duckdb DECIMAL -> float64
    return {"u": "i"}.get(k, k)

def main(sf_dir: str, out_dir: str):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ok = fail = 0
    for name in sorted(oracle):
        res_path = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(res_path, "*.parquet")):
            print(f"MISSING  {name}"); fail += 1; continue
        got = pd.concat([pd.read_parquet(p) for p in
                         sorted(glob.glob(os.path.join(res_path, "*.parquet")))])
        try:
            lint = lint_oracle_types(con, name, oracle[name])
            if lint:
                print(f"TYPE-LINT {name}: {lint}"); fail += 1; continue
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); fail += 1; continue
        # Un-coerced dtype-kind compare on the PRE-canon frames (canon
        # stringifies object columns): an int column on one side vs a
        # float/object column on the other is exactly the class the
        # driver's hasher flags but value-coercion hides.
        kind_bad = [(c, got[c].dtype, want[c].dtype)
                    for c in got.columns if c in want.columns
                    if len(got) > 0 and len(want) > 0
                    and dtype_kind(got[c]) != dtype_kind(want[c])]
        if kind_bad:
            print(f"DTYPE    {name}: engine-vs-oracle dtype-kind drift {kind_bad}")
            fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA   {name}: got {list(g.columns)} want {list(w.columns)}"); fail += 1; continue
        if len(g) != len(w):
            print(f"ROWS     {name}: got {len(g)} want {len(w)}"); fail += 1; continue
        mismatch = None
        for c in g.columns:
            a, b = g[c].values, w[c].values
            if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(w[c].dtype, np.floating):
                af = pd.to_numeric(g[c]).values.astype(float)
                bf = pd.to_numeric(w[c]).values.astype(float)
                eq = (np.isnan(af) & np.isnan(bf)) | (af == bf)
            else:
                eq = (pd.isna(g[c]).values & pd.isna(w[c]).values) | (a == b)
            if not eq.all():
                i = int(np.argmin(eq))
                mismatch = f"col {c} row {i}: got {a[i]!r} want {b[i]!r}"
                break
        if mismatch:
            print(f"VALUES   {name}: {mismatch}"); fail += 1
        else:
            print(f"OK       {name} ({len(g)} rows)"); ok += 1
    print(f"\n{ok} ok, {fail} failed")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
