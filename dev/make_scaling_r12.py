#!/usr/bin/env python3
"""Build BENCH_SCALING_r12.json: the FULL-registry two-decade scaling
artifact (VERDICT r11 task 1 — prescribed for r11, executed in r12).

Unlike the hand-extended r10 artifact, every input here is a COMMITTED
file, so re-running this script always reproduces the committed artifact
byte-for-byte (the ADVICE-r10 reproducibility requirement is met by
construction, no pinned-table fallback needed):

 - sf0.1 anchor: bench_out.json (the committed drift baseline).
 - sf1:  bench_sf1_r12.json  — full 206-query quiet-window sweep over
   MakeSf1 10x replication of sf0.1 (/tmp/sf1), best-of-2, noop sink.
 - sf10: bench_sf10_r12.json — same registry over 100x replication
   (/tmp/sf10), one quiet window immediately after the sf1 sweep.
 - steady-state overrides: immediate re-runs of queries whose FIRST
   sf10 number carried the documented cold-page-cache+JIT transient
   (the r10 q49/t32 lesson: re-run to steady state before reading an
   exponent off one sweep number), merged from
   bench_sf10_r12_steady.json when present.

Exponent per decade: e = log10(t_hi / t_lo). Queries under MIN_SEC at
the lower scale are skipped for that decade's exponent (a 0.2 s -> 0.5 s
move is scheduler noise, not a scaling law). Any sf1->sf10 exponent
above 1.1 lands in flagged_over_1.1 for a root-cause note in SURVEY
§4.1.
"""
import json
import math
import os

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

MIN_SEC = 0.3  # below this at the lower scale, the exponent is noise


def load(name):
    with open(os.path.join(REPO, name)) as f:
        return json.load(f)["queries"]


def main():
    sf01 = load("bench_out.json")
    sf1 = load("bench_sf1_r12.json")
    sf10 = load("bench_sf10_r12.json")
    steady_path = os.path.join(REPO, "bench_sf10_r12_steady.json")
    steady = {}
    if os.path.exists(steady_path):
        with open(steady_path) as f:
            steady = json.load(f)["queries"]

    queries = {}
    flagged = []
    for q in sorted(sf10):
        if q not in sf01 or q not in sf1:
            continue
        t01, t1 = sf01[q], sf1[q]
        t10 = min(sf10[q], steady[q]) if q in steady else sf10[q]
        entry = {
            "sf01": round(t01, 3),
            "sf1": round(t1, 3),
            "sf10": round(t10, 3),
            "ratio_01_to_1": round(t1 / t01, 2),
            "ratio_1_to_10": round(t10 / t1, 2),
        }
        if t01 >= MIN_SEC:
            entry["exp_decade1"] = round(math.log10(t1 / t01), 3)
        if t1 >= MIN_SEC:
            e2 = round(math.log10(t10 / t1), 3)
            entry["exp_decade2"] = e2
            if e2 > 1.1:
                flagged.append(q)
        if q in steady:
            entry["sf10_first_run"] = round(sf10[q], 3)
            entry["steady_state"] = True
        queries[q] = entry

    out = {
        "data_ratio_per_decade": 10.0,
        "note": (
            "round-12 two-decade scaling: the FULL registry "
            f"({len(queries)} queries) at sf0.1 (committed bench_out.json "
            "anchor), sf1 and sf10 (MakeSf1 structure-preserving 10x/100x "
            "replication of the driver sf0.1; embeddings isometry with "
            "sign-flips for reps>64), local[32], best-of-2 per query, noop "
            "sink; sf1 and sf10 each one quiet window, sf10 first. "
            "exp = log10(time ratio) per 10x data decade; exponents "
            f"suppressed where the lower-scale time is under {MIN_SEC} s "
            "(scheduler noise, not a scaling law); queries in "
            "flagged_over_1.1 (exp_decade2 > 1.1) are root-caused in "
            "SURVEY 4.1; sf10 entries marked steady_state carry the "
            "min of the sweep number and an immediate re-run (the r10 "
            "cold-cache+JIT lesson), with the first-run number kept "
            "beside it."
        ),
        "flagged_over_1.1": flagged,
        "totals": {
            "sf01": round(sum(sf01[q] for q in queries), 1),
            "sf1": round(sum(sf1[q] for q in queries), 1),
            "sf10": round(sum(v["sf10"] for v in queries.values()), 1),
        },
        "queries": queries,
    }
    dst = os.path.join(REPO, "BENCH_SCALING_r12.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {dst}: {len(queries)} queries, "
          f"{len(flagged)} flagged: {flagged}")


if __name__ == "__main__":
    main()
