#!/usr/bin/env python3
"""Build BENCH_SCALING_r13.json: the r12 full-registry two-decade
artifact carried forward, plus fresh sf1/sf10 measurements of the
round-13 capacity twins (VERDICT r12 task 1 — d35_semdedup_scaled
closing d16's measured e2 1.95, m12_phash_wide closing m6's 1.69, the
same move d34 made for d14 in r12).

Every input is a COMMITTED file, so re-running reproduces the artifact
byte-for-byte:

 - BENCH_SCALING_r12.json — the full-registry r12 sweep (206 queries),
   carried forward unchanged (each carried entry keeps its r12 fields
   and gains measured_round=12).
 - bench_out.json — committed sf0.1 drift baseline, the anchor for the
   new queries.
 - bench_sf1_r13.json / bench_sf10_r13.json — quiet-window best-of-2
   runs of JUST the round-13 queries over the same MakeSf1 10x/100x
   replication (/tmp/sf1, /tmp/sf10) as the r12 sweep.
 - bench_sf10_r13_steady.json (optional) — immediate sf10 re-runs for
   cold-transient queries, min-merged per the r10 lesson.

Exponents e = log10(t_hi / t_lo) per decade, suppressed where the
lower-scale time is under MIN_SEC; exp_decade2 > 1.1 lands in
flagged_over_1.1 for a SURVEY 4.1 root-cause note.
"""
import json
import math
import os

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

MIN_SEC = 0.3


def load(name):
    with open(os.path.join(REPO, name)) as f:
        return json.load(f)["queries"]


def main():
    with open(os.path.join(REPO, "BENCH_SCALING_r12.json")) as f:
        r12 = json.load(f)
    sf01 = load("bench_out.json")

    def steady_of(name):
        path = os.path.join(REPO, name)
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)["queries"]

    queries = {}
    for q, v in r12["queries"].items():
        queries[q] = dict(v, measured_round=12)

    # two measurement waves this round, same recipe: the capacity twins
    # (r13) and the second-wave new operators (r13b)
    waves = [
        (load("bench_sf1_r13.json"), load("bench_sf10_r13.json"),
         steady_of("bench_sf10_r13_steady.json")),
        (load("bench_sf1_r13b.json"), load("bench_sf10_r13b.json"),
         steady_of("bench_sf10_r13b_steady.json")),
    ]
    for sf1, sf10, steady in waves:
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
                "measured_round": 13,
            }
            if t01 >= MIN_SEC:
                entry["exp_decade1"] = round(math.log10(t1 / t01), 3)
            if t1 >= MIN_SEC:
                entry["exp_decade2"] = round(math.log10(t10 / t1), 3)
            if q in steady:
                entry["sf10_first_run"] = round(sf10[q], 3)
                entry["steady_state"] = True
            queries[q] = entry

    flagged = sorted(q for q, v in queries.items()
                     if v.get("exp_decade2", 0) > 1.1)

    def twin(slow, fast):
        s, f = queries[slow], queries[fast]
        return {
            "saturated": slow, "capacity_sized": fast,
            "sf10_sec": [s["sf10"], f["sf10"]],
            "exp_decade2": [s.get("exp_decade2"), f.get("exp_decade2")],
            "speedup_sf10": round(s["sf10"] / f["sf10"], 1),
        }

    out = {
        "data_ratio_per_decade": 10.0,
        "note": (
            "round-13 two-decade scaling: the r12 full-registry sweep "
            "carried forward (measured_round=12) plus fresh quiet-window "
            "best-of-2 measurements of the round-13 queries "
            "(measured_round=13) over the same MakeSf1 10x/100x "
            "replication, local[32], noop sink. The capacity_twins block "
            "is the round's claim: each r12 measured quadratic (fixed "
            "blocking capacity saturating as the corpus outgrows it) now "
            "has a same-pipeline twin whose capacity grows with the "
            "corpus, measured at both decades. exp = log10(time ratio) "
            f"per decade, suppressed under {MIN_SEC} s at the lower "
            "scale; flagged_over_1.1 queries are root-caused in SURVEY "
            "4.1 (the remaining flags are the PINNED-capacity originals "
            "whose closure the twins are)."
        ),
        "capacity_twins": {
            "d14_simhash_neardup": twin("d14_simhash_neardup",
                                        "d34_simhash_wide"),
            "d16_semdedup": twin("d16_semdedup", "d35_semdedup_scaled"),
            "m6_phash_neardup": twin("m6_phash_neardup", "m12_phash_wide"),
        },
        "flagged_over_1.1": flagged,
        "totals": {
            "sf01": round(sum(v["sf01"] for v in queries.values()), 1),
            "sf1": round(sum(v["sf1"] for v in queries.values()), 1),
            "sf10": round(sum(v["sf10"] for v in queries.values()), 1),
        },
        "queries": queries,
    }
    dst = os.path.join(REPO, "BENCH_SCALING_r13.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {dst}: {len(queries)} queries, "
          f"{len(flagged)} flagged: {flagged}")
    for k, v in out["capacity_twins"].items():
        print(f"  twin {k}: {v}")


if __name__ == "__main__":
    main()
