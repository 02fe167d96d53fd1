#!/usr/bin/env python3
"""Dev-only: compare two Bench JSON artifacts per query.

Usage: compare_bench.py OLD.json NEW.json [threshold]
Prints queries slower than threshold x (default 1.5) and > 0.5 s absolute,
plus totals — the round-4 lesson is that a recorded artifact's tail can lie
for harness reasons, so regressions must be read per query, not per total.
"""
import json, sys

import re

def load(p):
    """Accept either a raw Bench JSON line (possibly sbt-prefixed) or the
    driver's BENCH_rN.json wrapper, whose `tail` holds a truncated fragment
    of the line — in that case recover what per-query figures survive."""
    text = open(p).read()
    try:
        d = json.loads(text)
        if "queries" in d:
            return d
        if "tail" in d:  # driver wrapper: parse 'q..":N' pairs from the tail
            qs = {m.group(1): float(m.group(2)) for m in
                  re.finditer(r'"(q[0-9a-z_]+)":([0-9.eE+-]+)', d["tail"])}
            return {"queries": qs, "partial": True}
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        i = line.find("{")
        if i >= 0:
            try:
                d = json.loads(line[i:])
                if "queries" in d:
                    return d
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no bench JSON found in {p}")

def main(old_p, new_p, thresh=1.5):
    old, new = load(old_p), load(new_p)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    print(f"shared queries: {len(shared)}  old-only: {len(set(oq)-set(nq))}  "
          f"new-only: {len(set(nq)-set(oq))}")
    print(f"old total (shared): {sum(oq[q] for q in shared):.1f}s   "
          f"new total (shared): {sum(nq[q] for q in shared):.1f}s")
    regressions = [(q, oq[q], nq[q]) for q in shared
                   if nq[q] > oq[q] * thresh and nq[q] - oq[q] > 0.5]
    regressions.sort(key=lambda t: t[2] - t[1], reverse=True)
    if not regressions:
        print(f"no regressions beyond {thresh}x + 0.5s")
    for q, o, n in regressions:
        print(f"REGRESSED {q}: {o:.2f}s -> {n:.2f}s ({n/o:.1f}x)")
    # nonzero exit when regressed, so automation gating on the exit code works
    return 1 if regressions else 0

if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
