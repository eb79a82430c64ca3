#!/usr/bin/env python3
"""Bench regression tripwire: compare two Bench JSON lines (e.g. the
previous round's BENCH_r{N}.json vs a fresh local run) and flag

  - queries that error in NEW but not in OLD,
  - queries that disappeared entirely,
  - per-query slowdowns worse than RATIO x (default 2.0) -- but only
    when the regression clears the NOISE GUARDS below.

Noise guards (this container is multi-tenant; identical-code runs have
shown a 1.5 s query stall to 76 s once, and sketch_certify wander
2.8 <-> 3.9 s across rounds):

  - NOISE_SEC = 0.5: sub-half-second timings are scheduling noise.
  - spread band: Bench emits per-query `spread` = (max pass - min pass)
    within the SAME run. A "slowdown" whose absolute delta
    (t_new - t_old) is inside max(old spread, new spread) is the box
    wandering, not the plan: the same binary produced timings that far
    apart within one run. Such flags are reported as NOISE lines (rc 0).

So the documented tripwire is: flag iff
    t_new > 0.5 s  AND  t_new / t_old > ratio (default 2.0)
    AND (t_new - t_old) > max(spread_old, spread_new)
(older history lines without `spread` fall back to spread = 0, i.e.
the pre-round-9 behavior).

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

flags, noise = [], []
for name, err in sorted(new.get("errors", {}).items()):
    if name not in old.get("errors", {}):
        flags.append(f"NEW ERROR  {name}: {err[:100]}")
for name, t_old in sorted(old.get("queries", {}).items()):
    if name in new.get("queries", {}):
        t_new = new["queries"][name]
        if t_new > NOISE_SEC and t_old > 0 and t_new / t_old > ratio:
            band = max(old.get("spread", {}).get(name, 0.0),
                       new.get("spread", {}).get(name, 0.0))
            line = (f"{name}: {t_old:.2f}s -> {t_new:.2f}s "
                    f"({t_new / t_old:.1f}x, band {band:.2f}s)")
            if (t_new - t_old) > band:
                flags.append(f"SLOWDOWN   {line}")
            else:
                noise.append(f"NOISE      {line} — inside same-run spread, not flagged")
    elif name not in new.get("errors", {}):
        flags.append(f"MISSING    {name}: present in old run, absent from new")

n_old, n_new = len(old.get("queries", {})), len(new.get("queries", {}))
print(f"old: {n_old} queries, {len(old.get('errors', {}))} errors; "
      f"new: {n_new} queries, {len(new.get('errors', {}))} errors")
for f in flags + noise:
    print(f)
if not flags:
    print(f"OK: no new errors, no missing queries, no >{ratio}x slowdowns "
          f"above {NOISE_SEC}s outside the spread band")
sys.exit(1 if flags else 0)
