#!/usr/bin/env python3
"""One-command DuckDB anchor (VERDICT r12 #7): turn the committed
oracle dump + a Spark bench JSON into the round's anchor artifact, so
the 2x acceptance bar is a checkable number at round close instead of
a hand-assembled comparison.

  python3 tools/anchor.py SF_DIR ORACLE_SQL_JSON SPARK_BENCH_JSON OUT_JSON

- DuckDB timings come from tools/bench_duckdb.py's HEADLINE protocol
  (best-of-3, preamble stripped, natural thread count).
- Spark timings come from the given Bench JSON (the per-round
  bench_out.json / BENCH_r{N}.json "queries" map).
- The "batch-comparable" subset excludes the classes where the two
  engines run structurally different work (streaming state machinery,
  incremental store maintenance, drift/recall/certify certificates
  that deliberately run both twins) -- the same classification as
  bench_history/r12_duckdb_anchor.json, now encoded here.

Exits 1 when the overall anchored ratio exceeds the 2x bar.
"""
import json, subprocess, sys

def batch_comparable(name: str) -> bool:
    if name.startswith("streaming_"):
        return False
    return not any(p in name for p in
                   ("_incremental", "_delete", "drift", "recall", "certify"))

def main():
    if len(sys.argv) != 5:
        print(__doc__)
        sys.exit(2)
    sf_dir, oracle_json, spark_bench, out_path = sys.argv[1:5]

    proc = subprocess.run(
        [sys.executable, "tools/bench_duckdb.py", sf_dir, oracle_json],
        capture_output=True, text=True)
    if proc.returncode != 0:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        sys.exit(1)
    duck = json.loads(proc.stdout.strip().splitlines()[-1])["queries"]

    bench = json.load(open(spark_bench))
    if "parsed" in bench:  # driver BENCH_r{N}.json wrapper
        bench = bench["parsed"]
    spark = {k: v for k, v in bench["queries"].items()
             if isinstance(v, (int, float))}

    common = sorted(set(duck) & set(spark))
    d_sum = sum(duck[n] for n in common)
    s_sum = sum(spark[n] for n in common)
    batch = [n for n in common if batch_comparable(n)]
    bd = sum(duck[n] for n in batch)
    bs = sum(spark[n] for n in batch)
    out = {
        "sf": sf_dir.rstrip("/").split("/")[-1],
        "n_anchored": len(common),
        "duckdb_sec": round(d_sum, 1),
        "spark_sec": round(s_sum, 1),
        "ratio": round(s_sum / d_sum, 2) if d_sum else None,
        "n_batch_comparable": len(batch),
        "batch_duckdb_sec": round(bd, 1),
        "batch_spark_sec": round(bs, 1),
        "batch_ratio": round(bs / bd, 2) if bd else None,
        "spark_bench": spark_bench,
        "duckdb": {n: duck[n] for n in common},
        "spark": {n: round(spark[n], 3) for n in common},
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"anchor: {len(common)} queries, DuckDB {out['duckdb_sec']}s vs "
          f"Spark {out['spark_sec']}s -> ratio {out['ratio']} "
          f"(batch-comparable {out['n_batch_comparable']}: {out['batch_ratio']})")
    if out["ratio"] is not None and out["ratio"] > 2.0:
        print("anchor FAIL: overall ratio exceeds the 2x acceptance bar")
        sys.exit(1)
    print(f"anchor OK -> {out_path}")

if __name__ == "__main__":
    main()
