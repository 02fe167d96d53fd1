#!/usr/bin/env python3
"""Re-base BENCH_EXPECTED.json from two full-catalog bench passes.

Round-17 usage (the rep-structure change cooled within-query rep-2
warmth, so the manifest must hold quiet-window mins measured under the
NEW two-order pass structure):

    python3 tools/rebase_expected.py RUN1.json RUN2.json NOTE_APPENDIX

Per query: expected = min over the runs' FULL-PASS values from runs
where the query did NOT flag. Isolated adjudication values substitute
ONLY when every run flagged the query (no clean full-pass measurement
exists) — isolated re-runs happen in a quiet warm JVM that
systematically under-reads contention cost (Bench.scala's round-17
note), so an unconditional min over isolated values seeds
unachievably-low baselines and manufactures recurring phantom flags
(round-17 advisory). Queries present in only one run are taken from
it. The old manifest's note is preserved with the appendix appended;
sf and streaming_ratio_max carry over.
"""
import json
import sys

def load(p):
    with open(p) as f:
        return json.load(f)

def main():
    run1, run2, appendix = sys.argv[1], sys.argv[2], sys.argv[3]
    old = load("BENCH_EXPECTED.json")
    runs = [load(run1), load(run2)]
    clean, subst = {}, {}
    for r in runs:
        iso = {f["q"]: f["isolated_s"] for f in r.get("flags", [])
               if f.get("isolated_s", -1) >= 0}
        for name, v in r["queries"].items():
            if name in iso:
                # this run's pass value is transient-inflated; its
                # isolated value is the SUBSTITUTE, used only if no run
                # measured the query clean
                subst[name] = min(subst.get(name, iso[name]), iso[name])
            else:
                clean[name] = min(clean.get(name, v), v)
    qs = dict(subst)
    qs.update(clean)  # a clean full-pass value always wins
    out = {
        "sf": old["sf"],
        "note": old["note"] + " | " + appendix,
        "queries": {k: round(v, 4) for k, v in sorted(qs.items())},
        "streaming_ratio_max": old["streaming_ratio_max"],
    }
    with open("BENCH_EXPECTED.json", "w") as f:
        json.dump(out, f, indent=None)
        f.write("\n")
    tot = sum(out["queries"].values())
    print(f"re-based {len(out['queries'])} queries, summed {tot:.1f} s")

if __name__ == "__main__":
    main()
