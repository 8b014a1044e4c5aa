#!/usr/bin/env python3
"""Regenerate the pinned x_host_rank64 oracle (host-graph PageRank over the
links extracted from the pinned 64-url corpus — sibling of
links_oracle_gen.py; composition of x_links64's extraction and
q_pagerank's integer iteration).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout x_host_rank64"
  python3 scripts/hostrank_oracle_gen.py /tmp/vout > /tmp/hostrank_oracle.sql

Then paste the emitted SQL into ExtractionQueries.oracles
("x_host_rank64"). Golden audit discipline: regenerate ONLY after a
deliberate link/graph-semantics change, eyeball the diff, commit. The
query is sf-invariant (urls 0..63 identical at every sf).
"""
import sys
import duckdb

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
con = duckdb.connect()
rows = con.execute(
    f"SELECT host, outdeg, pr FROM '{vout}/x_host_rank64/*.parquet' ORDER BY host"
).fetchall()
assert rows, "no host rank rows"
hosts = [r[0] for r in rows]
assert "ads.example" in hosts and "ref.example" in hosts, hosts
# link sinks have no outlinks and must out-rank teleport-only hosts
sinks = {h: pr for (h, od, pr) in rows if od == 0 and h in ("ads.example", "ref.example")}
tele_only = min(pr for (_, _, pr) in rows)
assert all(pr > tele_only for pr in sinks.values()), (sinks, tele_only)
print("SELECT * FROM (VALUES")
print(",\n".join(f"  ('{h}', {od}, {pr})" for (h, od, pr) in rows))
print(") t(host, outdeg, pr) ORDER BY host")
