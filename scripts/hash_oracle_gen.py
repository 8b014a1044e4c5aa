#!/usr/bin/env python3
"""Regenerate the pinned x_extract_hashes oracle (the driver-visible analog
of the golden fixtures).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
  python3 scripts/hash_oracle_gen.py /tmp/vout > /tmp/hash_oracle.sql

Then paste the emitted SQL into ExtractionQueries.oracles
("x_extract_hashes"). Same discipline as GoldenGen: regenerate ONLY after a
deliberate extraction-semantics change, eyeball the diff, commit.
"""
import sys
import duckdb

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
con = duckdb.connect()
rows = con.execute(
    f"SELECT url, document_type, content_sha256 FROM '{vout}/x_extract_hashes/*.parquet' ORDER BY url"
).fetchall()
assert len(rows) == 64, f"expected 64 pinned rows, got {len(rows)}"
print("SELECT * FROM (VALUES")
body = ",\n".join(f"  ('{u}', '{t}', '{h}')" for (u, t, h) in rows)
print(body)
print(") t(url, document_type, content_sha256) ORDER BY url")
