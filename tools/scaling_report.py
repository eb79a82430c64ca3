#!/usr/bin/env python3
"""10x scaling report: compare a Bench JSON line at sf0.1 with one at
sf1 (the ScaleUp fixture) and emit the per-query ratio table for
PERF.md.

Ratio semantics (sf1 sec / sf0.1 sec) on a fixed local[32] box:
  ~1    the extra data was absorbed by existing parallelism headroom
  ~10   linear work, no headroom left (shuffle- or CPU-saturated)
  >10   SUPER-LINEAR: the operator's work grows faster than its input
        (quadratic candidate generation, unguarded skew, driver
        materialization) — this is the line the round must explain or
        fix. The threshold is deliberately the scale factor itself:
        anything <= 10x is at worst linear.

Usage: python3 tools/scaling_report.py SF01.json SF1.json [--md] [--factor=N]

--factor=N sets the scale factor between the two runs (default 10):
the super-linear line and the bucket edges scale with it, so the same
tool reports the sf0.1->sf10 decade pair (--factor=100).
"""
import json, signal, sys

# default SIGPIPE so `... | head` truncates quietly instead of tracebacking
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

# the scale factor: ratios above this are super-linear
SUPER = 10.0
for arg in sys.argv[1:]:
    if arg.startswith("--factor="):
        SUPER = float(arg.split("=", 1)[1])

def load(path):
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "queries" in doc:
            return doc
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no Bench JSON line in {path}")

# flags before positionals: `scaling_report.py --md a b` must not read
# "--md" as the first file (ADVICE r9)
md = "--md" in sys.argv
pos = [x for x in sys.argv[1:] if not x.startswith("--")]
if len(pos) < 2:
    raise SystemExit("usage: scaling_report.py SF01.json SF1.json [--md]")
a, b = load(pos[0]), load(pos[1])
qa, qb = a["queries"], b["queries"]
sa, sb = a.get("setup", {}), b.get("setup", {})

missing = sorted(set(qa) ^ set(qb))
if missing:
    print(f"WARNING: suites differ on {missing}")

ratios = {k: qb[k] / qa[k] for k in qa if k in qb and qa[k] > 0}
setup_ratios = {k: sb[k] / sa[k] for k in sa if k in sb and sa[k] > 0}

# bucket edges scale with the factor; at the default 10 they are the
# historical 1.2 / 2.2 / 4 / 10 lines PERF.md has tracked since r6
e1, e2, e3 = 1 + 0.02 * SUPER, 0.22 * SUPER, 0.4 * SUPER
buckets = [
    (f"<= {e1:.1f} (absorbed by parallelism)", lambda r: r <= e1),
    (f"{e1:.1f} - {e2:.1f} (sub-linear)", lambda r: e1 < r <= e2),
    (f"{e2:.1f} - {e3:.1f} (shuffle-bound, still sub-linear)", lambda r: e2 < r <= e3),
    (f"{e3:.1f} - {SUPER:.0f} (near-linear)", lambda r: e3 < r <= SUPER),
    (f"> {SUPER:.0f} (SUPER-LINEAR)", lambda r: r > SUPER),
]

qs01 = sum(qa.values()); qs1 = sum(qb.values())
st01 = sum(sa.values()); st1 = sum(sb.values())
# guard every division like the st01 one: a malformed/empty-queries line
# should report zeros, not ZeroDivisionError (ADVICE r9)
print(f"queries: {len(ratios)} common; query-sum {qs01:.1f} -> {qs1:.1f} s "
      f"({qs1 / qs01 if qs01 else 0:.2f}x); setup {st01:.1f} -> {st1:.1f} s "
      f"({st1 / st01 if st01 else 0:.2f}x); "
      f"total {(qs01 + st01):.1f} -> {(qs1 + st1):.1f} s "
      f"({(qs1 + st1) / (qs01 + st01) if qs01 + st01 else 0:.2f}x)")
import statistics
med = statistics.median(ratios.values()) if ratios else 0.0
print(f"median query ratio {med:.2f}; "
      f"super-linear (> {SUPER:.0f}x): "
      f"{sorted(k for k, r in ratios.items() if r > SUPER) or 'none'}")
print()

if md:
    print("| ratio | queries |")
    print("|---|---|")
for title, pred in buckets:
    members = sorted(((k, r) for k, r in ratios.items() if pred(r)),
                     key=lambda x: x[1])
    if not members:
        continue
    body = ", ".join(f"{k} {r:.2f}" for k, r in members)
    if md:
        print(f"| {title} | {body} |")
    else:
        print(f"== {title} ==\n{body}\n")

sup_setup = sorted(((k, r) for k, r in setup_ratios.items() if r > 4),
                   key=lambda x: -x[1])
if sup_setup:
    print("\nsetup builds > 4x: "
          + ", ".join(f"{k} {r:.1f}x ({sa[k]:.2f}->{sb[k]:.2f}s)"
                      for k, r in sup_setup))
sys.exit(0)
