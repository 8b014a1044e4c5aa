#!/usr/bin/env python3
"""Regenerate the pinned x_extract_stats64 oracle (per-type envelope stats
over the 64 golden urls — chunk/table/page-count hard check, sibling of
hash_oracle_gen.py).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
  python3 scripts/stats_oracle_gen.py /tmp/vout > /tmp/stats_oracle.sql

Then paste the emitted SQL into ExtractionQueries.oracles
("x_extract_stats64"). Same discipline as GoldenGen: regenerate ONLY after
a deliberate extraction-semantics change, eyeball the diff, commit.
"""
import sys
import duckdb

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
con = duckdb.connect()
rows = con.execute(
    f"SELECT document_type, n_docs, content_chars, n_chunks, n_tables, pages "
    f"FROM '{vout}/x_extract_stats64/*.parquet' ORDER BY document_type"
).fetchall()
assert rows, "no stats rows found"
assert sum(r[1] for r in rows) == 64, f"expected 64 docs total, got {sum(r[1] for r in rows)}"
print("SELECT * FROM (VALUES")
print(",\n".join(f"  ('{t}', {nd}, {cc}, {nc}, {nt}, {pg})" for (t, nd, cc, nc, nt, pg) in rows))
print(") t(document_type, n_docs, content_chars, n_chunks, n_tables, pages) ORDER BY document_type")
