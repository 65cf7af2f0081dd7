#!/usr/bin/env python3
"""Merge N full Bench artifacts into the round's canonical one
(per-query MIN over runs — the repo's bench convention since r12).

Usage: bench_merge.py <out.json> <run1.json> <run2.json> [...]

Carries the r14 canary fields coherently: `queries` takes each query's min
across runs; `query_calib` takes the basis from the RUN that produced that
min (the basis travels with its measurement); `calib_series` concatenates
every run's series (one list per run-pass, flattened per run here);
`calib_s` is the min over all samples, `calib_max_s` the max — so the merged
artifact still exposes the full mid-run swing. `value`/`value_norm*` are
recomputed from the merged per-query map. Failures: a query failed in the
merged artifact only if it failed in EVERY run.
"""
import json
import sys


def main():
    out_path, paths = sys.argv[1], sys.argv[2:]
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f))
    names = sorted(set().union(*[set(r["queries"]) for r in runs]))
    queries, query_calib = {}, {}
    for q in names:
        best, basis = None, None
        for r in runs:
            v = r["queries"].get(q)
            if v is not None and (best is None or v < best):
                best = v
                basis = (r.get("query_calib") or {}).get(q)
        queries[q] = round(best, 3)
        if basis is not None:
            query_calib[q] = basis
    series = []
    for r in runs:
        s = r.get("calib_series")
        if s:
            series.extend(s)
    flat = [x for p in series for x in p]
    calib = min(flat) if flat else None
    calib_max = max(flat) if flat else None
    # collect first: min() over an empty generator raises, and every-run-null
    # calib_jobs_s (older or calibration-failed artifacts) should degrade to
    # None like calib_s does, not crash the merge (ADVICE r14)
    calib_jobs_vals = [r["calib_jobs_s"] for r in runs
                       if r.get("calib_jobs_s") is not None]
    calib_jobs = min(calib_jobs_vals) if calib_jobs_vals else None
    failed = sorted(set(runs[0].get("failed") or []).intersection(
        *[set(r.get("failed") or []) for r in runs[1:]])) if runs else []
    total = round(sum(queries.values()), 3)
    # headline norm from the per-query bases (r15, matching Bench.scala):
    # Σ_q t_q/basis_q, each min normalized by the canary sample that rode
    # its winning run — one unrepresentative series sample no longer scales
    # the whole total. Fallback: total/calib when any basis is missing.
    if queries and all(query_calib.get(q) for q in queries):
        value_norm = round(sum(t / query_calib[q] for q, t in queries.items()), 3)
    else:
        value_norm = round(total / calib, 3) if calib else None
    merged = {
        "metric": "total", "value": total, "unit": "sec",
        "value_norm": value_norm,
        "value_norm_jobs": round(total / calib_jobs, 3) if calib_jobs else None,
        "calib_s": calib, "calib_max_s": calib_max,
        "calib_jobs_s": calib_jobs,
        "calib_series": series,
        "query_calib": query_calib,
        "queries": queries,
        "n_queries": len(queries),
        "n_failed": len(failed), "failed": failed,
        "excluded": runs[0].get("excluded") or {},
        "cpus": runs[0].get("cpus"), "sf": runs[0].get("sf"),
        "merged_from": len(paths),
    }
    with open(out_path, "w") as f:
        json.dump(merged, f)
    print(f"merged {len(paths)} runs -> {out_path}: total={total} "
          f"calib_s={calib} calib_max_s={calib_max} n={len(queries)}")


if __name__ == "__main__":
    main()
