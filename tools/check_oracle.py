#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle on the same parquet tables. Dev tool only (not engine code).

Two checks beyond value equality, both modeled on the driver's hash:
  1. Oracle output types must not be HUGEINT/UHUGEINT — DuckDB types a
     bare sum(BIGINT) as HUGEINT, which pandas renders as float
     ("15340.0") against Spark's long ("15340"), failing the driver's
     hash while rows/schema still pass. Checked via rel.types for every
     oracle, before execution, so any future bare sum() fails here first.
  2. Per-column dtype kinds must agree between the Spark result and the
     oracle result (int-vs-float etc.) — exact reprs for non-float
     columns, %.6g tolerance only where BOTH sides are float.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb, pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def canon(df: pd.DataFrame, float_cols: set) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell_exact(v):
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + " ".join(str(x) for x in v) + "]"
        return str(v)

    def cell_float(v):
        if isinstance(v, float):
            return f"{v:.6g}"
        return cell_exact(v)

    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        fn = cell_float if c in float_cols else cell_exact
        out[c] = df[c].map(fn)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            rel = con.sql(oracle[name])
            # structural typing gate: catches HUGEINT before any value compare
            bad = [c for c, t in zip(rel.columns, rel.types)
                   if str(t).upper() in BAD_ORACLE_TYPES]
            if bad:
                print(f"FAIL {name}: oracle emits {'/'.join(BAD_ORACLE_TYPES)} "
                      f"column(s) {bad} — CAST(... AS BIGINT) in the oracle SQL")
                n_fail += 1; continue
            want = rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # the driver's hash renders ints and floats differently — a kind
        # mismatch is a guaranteed driver red even when values "look" equal
        kind_bad = [c for c in got.columns
                    if got[c].dtype.kind != want[c].dtype.kind]
        if kind_bad:
            det = {c: f"{got[c].dtype}!={want[c].dtype}" for c in kind_bad}
            print(f"FAIL {name}: dtype kind mismatch {det} (driver hash would fail)")
            n_fail += 1; continue
        # %.6g tolerance only where BOTH sides are float
        float_cols = {c for c in got.columns
                      if got[c].dtype.kind == "f" and want[c].dtype.kind == "f"}
        g, w = canon(got, float_cols), canon(want, float_cols)
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch at rows {list(idx)}")
            for i in idx:
                print("  got ", g.loc[i].to_dict())
                print("  want", w.loc[i].to_dict())
            n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
