#!/usr/bin/env python3
"""Regenerate the pinned x_links64 oracle (per-url outlink summary over the
64 pinned corpus urls — sibling of hash_oracle_gen.py).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout x_links64"
  python3 scripts/links_oracle_gen.py /tmp/vout > /tmp/links_oracle.sql

Then paste the emitted SQL into ExtractionQueries.oracles ("x_links64").
Same discipline as GoldenGen: regenerate ONLY after a deliberate
tokenizer/tree-builder/link-semantics change, eyeball the diff, commit.
The query is sf-invariant (urls 0..63 exist at every sf with identical
payloads), so the pinned values hold no matter what scale the driver
verifies at.
"""
import sys
import duckdb

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
con = duckdb.connect()
rows = con.execute(
    f"SELECT url, n_links, n_external, n_hosts, hosts_md5 "
    f"FROM '{vout}/x_links64/*.parquet' ORDER BY url"
).fetchall()
assert len(rows) == 64, f"expected 64 pinned urls, got {len(rows)}"
EMPTY_MD5 = "d41d8cd98f00b204e9800998ecf8427e"
html = [r for r in rows if r[1] > 0]
assert html, "no html rows with links — extractor regression?"
for (u, n, ext, nh, d) in rows:
    if n == 0:
        assert d == EMPTY_MD5, f"{u}: zero links but digest {d}"
print("SELECT * FROM (VALUES")
print(",\n".join(
    f"  ('{u}', {n}, {ext}, {nh}, '{d}')"
    for (u, n, ext, nh, d) in rows))
print(") t(url, n_links, n_external, n_hosts, hosts_md5) ORDER BY url")
