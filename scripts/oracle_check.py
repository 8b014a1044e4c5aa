#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 /tmp/oracle_check.py <sfDir> <voutDir> [skip_regex]

Reads <voutDir>/oracle_sql.json (dumped by graft.Verify), registers each
testdata parquet as a DuckDB view, runs every oracle, and compares against
<voutDir>/<name>.parquet the way the driver does: columns sorted by name,
values stringified, rows sorted, then hashed.

skip_regex (optional): oracle names to skip — used for cross-sf checks at
sf0.1, where the deliberately-quadratic brute-force dedup oracles
(pairwise list_intersect over 5k docs) are too slow for DuckDB; the
driver's gate runs the full set at sf0.01.
"""
import json, sys, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    # DRIVER-STRICT (round 5, VERDICT r4 #2): no whole-float -> int
    # coercion. The driver stringifies values as-is, so an engine that
    # returns 2628.0 where the other returns 2628 MUST fail here too —
    # the r4 q_hits red row shipped precisely because the old canon()
    # masked that drift locally.
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(float(v))  # float(...) strips numpy-2 repr noise
        return str(v)
    rows = sorted("\x01".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def dtype_clash(exp: pd.DataFrame, got: pd.DataFrame):
    """Return (fatal, warnings): float-vs-int column kind mismatches are
    FATAL (the driver's hash will diverge on any whole value); int-width
    (int32/int64) gaps stringify identically and pass; unsigned-vs-signed
    is a warning (equal only while values stay in the signed range)."""
    fatal, warns = [], []
    for c in exp.columns:
        ke, kg = exp[c].dtype.kind, got[c].dtype.kind
        ints = {"i", "u"}
        if (ke == "f" and kg in ints) or (kg == "f" and ke in ints):
            fatal.append(f"{c}: oracle {exp[c].dtype} vs spark {got[c].dtype}")
        elif {ke, kg} == ints:
            warns.append(f"{c}: oracle {exp[c].dtype} vs spark {got[c].dtype}")
    return fatal, warns


def main():
    sf_dir, vout = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{vout}/oracle_sql.json"))
    if len(sys.argv) > 3:
        import re
        pat = re.compile(sys.argv[3])
        skipped = sorted(n for n in oracles if pat.search(n))
        oracles = {n: q for n, q in oracles.items() if not pat.search(n)}
        print(f"skipping {len(skipped)}: {', '.join(skipped)}")
    n_ok = n_bad = 0
    for name in sorted(oracles):
        try:
            exp = con.execute(oracles[name]).fetchdf()
            import glob
            parts = sorted(glob.glob(f"{vout}/{name}/part-*.parquet")) or [f"{vout}/{name}.parquet"]
            got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
            if sorted(exp.columns) != sorted(got.columns):
                print(f"FAIL {name}: columns {sorted(exp.columns)} vs {sorted(got.columns)}")
                n_bad += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows {len(exp)} vs {len(got)}")
                n_bad += 1
                continue
            fatal, warns = dtype_clash(exp, got)
            for w in warns:
                print(f"warn {name}: signedness gap {w}")
            if fatal:
                print(f"FAIL {name}: float-vs-int dtype clash: {'; '.join(fatal)}")
                n_bad += 1
                continue
            he, hg = canon(exp), canon(got)
            if he != hg:
                print(f"FAIL {name}: hash mismatch ({len(exp)} rows)")
                ej = exp.reindex(sorted(exp.columns), axis=1)
                gj = got.reindex(sorted(got.columns), axis=1)
                print("  oracle head:\n", ej.head(3).to_string())
                print("  spark  head:\n", gj.head(3).to_string())
                n_bad += 1
            else:
                print(f"ok   {name} ({len(exp)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
