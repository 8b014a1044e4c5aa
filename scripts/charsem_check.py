#!/usr/bin/env python3
"""DuckDB replay of the character-position-sensitive oracles over the
widened (accented / Cyrillic / CJK / non-BMP) corpus that
graft.tools.CharSemCheck generates — the cross-engine character-semantics
differential for VERDICT r2 #8. Same canonical-hash compare as
oracle_check.py, but registers only `documents` and runs only the four
window queries.

Usage:
  sbt "runMain graft.tools.CharSemCheck /tmp/charsem"
  python3 scripts/charsem_check.py /tmp/charsem
"""
import glob
import json
import sys

import duckdb
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from oracle_check import canon  # noqa: E402


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/charsem"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    oracles = json.load(open(f"{d}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracles):
        exp = con.execute(oracles[name]).fetchdf()
        parts = sorted(glob.glob(f"{d}/{name}/part-*.parquet"))
        got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        if sorted(exp.columns) != sorted(got.columns) or len(exp) != len(got):
            print(f"FAIL {name}: shape {sorted(exp.columns)}x{len(exp)} vs {sorted(got.columns)}x{len(got)}")
            n_bad += 1
            continue
        if canon(exp) != canon(got):
            print(f"FAIL {name}: hash mismatch ({len(exp)} rows)")
            ej = exp.reindex(sorted(exp.columns), axis=1)
            gj = got.reindex(sorted(got.columns), axis=1)
            merged = ej.merge(gj, on="doc_id", suffixes=("_oracle", "_spark"))
            diff = merged[
                [c for c in merged.columns if c.endswith("_oracle") or c.endswith("_spark") or c == "doc_id"]
            ]
            mism = diff[
                ~(diff.filter(like="_oracle").rename(columns=lambda c: c[:-7]).astype(str).values
                  == diff.filter(like="_spark").rename(columns=lambda c: c[:-6]).astype(str).values).all(axis=1)
            ]
            print(mism.head(5).to_string())
            n_bad += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
