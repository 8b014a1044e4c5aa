#!/usr/bin/env python3
"""Regenerate the pinned x_media_features oracle (per-kind container-header
stats over the pinned 600-row synthetic media corpus — sibling of
stats_oracle_gen.py).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
  python3 scripts/media_oracle_gen.py /tmp/vout > /tmp/media_oracle.sql

Then paste the emitted SQL into ExtractionQueries.oracles
("x_media_features"). Same discipline as GoldenGen: regenerate ONLY after
a deliberate media-pipeline semantics change, eyeball the diff, commit.
The query is sf-invariant (media ids 0..599 at every sf), so the pinned
values hold no matter what scale the driver verifies at.
"""
import sys
import duckdb

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
con = duckdb.connect()
rows = con.execute(
    f"SELECT kind, n_media, total_bytes, max_width, max_sample_rate, "
    f"frames_sampled, feature_mass_r "
    f"FROM '{vout}/x_media_features/*.parquet' ORDER BY kind"
).fetchall()
assert rows, "no media feature rows found"
assert sum(r[1] for r in rows) == 600, f"expected 600 media total, got {sum(r[1] for r in rows)}"
assert [r[0] for r in rows] == ["audio", "image", "video"], rows
print("SELECT * FROM (VALUES")
# CAST: a bare decimal literal is DECIMAL in DuckDB; the Spark column is
# DOUBLE, and repr() round-trips the exact double
print(",\n".join(
    f"  ('{k}', {nm}, {tb}, {mw}, {msr}, {fs}, CAST({fm!r} AS DOUBLE))"
    for (k, nm, tb, mw, msr, fs, fm) in rows))
print(") t(kind, n_media, total_bytes, max_width, max_sample_rate, frames_sampled, feature_mass_r) ORDER BY kind")
