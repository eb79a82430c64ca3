#!/usr/bin/env python3
"""Bench regression tripwire: compare two Bench JSON lines (e.g. the
previous round's BENCH_r{N}.json vs a fresh local run) and flag

  - queries that error in NEW but not in OLD,
  - queries that disappeared entirely,
  - per-query slowdowns worse than RATIO x (only when the new time is
    above NOISE_SEC -- sub-half-second timings on this multi-tenant box
    are scheduling noise, not signal).

Exit code 1 on any flag, so the preflight ritual can gate on it.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [ratio]
"""
import json, sys

NOISE_SEC = 0.5

def load(path):
    """Accept either a raw Bench output line (possibly amid sbt noise)
    or the driver's BENCH_r{N}.json wrapper ({"rc": ..., "parsed": ...,
    "tail": <truncated>}). A wrapper whose parsed field is null carries
    only a truncated tail — unusable, say so instead of mis-comparing.
    """
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "queries" in doc:
            return doc
        if isinstance(doc, dict) and "parsed" in doc:
            if doc["parsed"]:
                return doc["parsed"]
            raise SystemExit(
                f"{path}: driver wrapper with parsed=null (truncated tail) — "
                "use a raw Bench line (e.g. bench_history/) instead")
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no Bench JSON line in {path}")

old, new = load(sys.argv[1]), load(sys.argv[2])
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

flags = []
for name, err in sorted(new.get("errors", {}).items()):
    if name not in old.get("errors", {}):
        flags.append(f"NEW ERROR  {name}: {err[:100]}")
for name, t_old in sorted(old.get("queries", {}).items()):
    if name in new.get("queries", {}):
        t_new = new["queries"][name]
        if t_new > NOISE_SEC and t_old > 0 and t_new / t_old > ratio:
            flags.append(f"SLOWDOWN   {name}: {t_old:.2f}s -> {t_new:.2f}s ({t_new / t_old:.1f}x)")
    elif name not in new.get("errors", {}):
        flags.append(f"MISSING    {name}: present in old run, absent from new")

n_old, n_new = len(old.get("queries", {})), len(new.get("queries", {}))
print(f"old: {n_old} queries, {len(old.get('errors', {}))} errors; "
      f"new: {n_new} queries, {len(new.get('errors', {}))} errors")
for f in flags:
    print(f)
if not flags:
    print(f"OK: no new errors, no missing queries, no >{ratio}x slowdowns above {NOISE_SEC}s")
sys.exit(1 if flags else 0)
