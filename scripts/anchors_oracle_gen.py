#!/usr/bin/env python3
"""Regenerate the pinned x_anchors64 oracle (per-host anchor-text stats
over the links of the pinned 64-url corpus — sibling of
links_oracle_gen.py).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout x_anchors64"
  python3 scripts/anchors_oracle_gen.py /tmp/vout > /tmp/anchors_oracle.sql

Then paste the emitted SQL into ExtractionQueries.oracles
("x_anchors64"). Golden audit discipline; sf-invariant (urls 0..63
identical at every sf).
"""
import sys
import duckdb

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
con = duckdb.connect()
rows = con.execute(
    f"SELECT host, n_terms, n_distinct_terms, terms_md5 "
    f"FROM '{vout}/x_anchors64/*.parquet' ORDER BY host"
).fetchall()
assert rows, "no anchor rows"
hosts = [r[0] for r in rows]
assert "ads.example" in hosts and "ref.example" in hosts, hosts
for (h, n, nd, d) in rows:
    assert n >= nd >= 1, (h, n, nd)
print("SELECT * FROM (VALUES")
print(",\n".join(f"  ('{h}', {n}, {nd}, '{d}')" for (h, n, nd, d) in rows))
print(") t(host, n_terms, n_distinct_terms, terms_md5) ORDER BY host")
