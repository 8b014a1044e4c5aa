#!/usr/bin/env python3
"""Regenerate the pinned x_extract_summary64 / x_extract_chunks64 /
x_extract_tables64 oracles (per-type envelope/chunk/table hard checks over
the 64 golden urls — siblings of stats_oracle_gen.py, VERDICT r4 #7).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
  python3 scripts/pinned64_oracle_gen.py /tmp/vout > /tmp/pinned64_oracle.sql

Then paste the emitted SQL into ExtractionQueries.oracles. Same discipline
as GoldenGen: regenerate ONLY after a deliberate extraction-semantics
change, eyeball the diff, commit.
"""
import sys
import duckdb

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
con = duckdb.connect()


def emit(name, cols, order, checks=None):
    rows = con.execute(
        f"SELECT {', '.join(cols)} FROM '{vout}/{name}/*.parquet' ORDER BY {order}"
    ).fetchall()
    assert rows, f"no rows for {name}"
    if checks:
        checks(rows)
    print(f"-- {name}")
    print("SELECT * FROM (VALUES")
    def lit(v):
        return f"'{v}'" if isinstance(v, str) else str(v)
    print(",\n".join("  (" + ", ".join(lit(v) for v in r) + ")" for r in rows))
    print(f") t({', '.join(cols)}) ORDER BY {order}")
    print()


emit("x_extract_summary64",
     ["document_type", "status", "n_docs", "content_chars", "pages"],
     "document_type, status",
     checks=lambda rows: [
         # all 64 pinned docs accounted for, every status string non-empty
         (lambda s: None if s == 64 else (_ for _ in ()).throw(
             AssertionError(f"expected 64 docs, got {s}")))(sum(r[2] for r in rows)),
     ])

emit("x_extract_chunks64",
     ["document_type", "n_chunks", "total_chunk_chars", "max_chunk_index"],
     "document_type")

emit("x_extract_tables64",
     ["document_type", "n_tables", "total_rows", "max_cols"],
     "document_type")
