#!/usr/bin/env python3
"""Regenerate the pinned x_extract_emb64 oracle (embedding-envelope digest
over the 64 golden urls — dim / chunk-count / square-norm hard check,
sibling of stats_oracle_gen.py).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
  python3 scripts/emb_oracle_gen.py /tmp/vout > /tmp/emb_oracle.sql

Then paste the emitted SQL into ExtractionQueries.oracles
("x_extract_emb64"). Same discipline as GoldenGen: regenerate ONLY after
a deliberate embedding/chunking-semantics change, eyeball the diff, commit.
"""
import sys
import duckdb

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
con = duckdb.connect()
rows = con.execute(
    f"SELECT dim, n_chunks, sqn100_sum, csum_sum, csum_min, csum_max "
    f"FROM '{vout}/x_extract_emb64/*.parquet' ORDER BY dim"
).fetchall()
assert rows, "no emb rows found"
assert all(d == 384 for (d, *_ ) in rows), f"unexpected dims: {[r[0] for r in rows]}"
for (d, n, s, *_ ) in rows:
    assert s == n * 100, f"non-unit-norm chunks present: dim={d} sqn100_sum={s} != {n*100}"
print("SELECT * FROM (VALUES")
print(",\n".join(f"  ({d}, {n}, {s}, {cs}, {lo}, {hi})" for (d, n, s, cs, lo, hi) in rows))
print(") t(dim, n_chunks, sqn100_sum, csum_sum, csum_min, csum_max) ORDER BY dim")
