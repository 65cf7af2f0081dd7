#!/usr/bin/env python3
"""Round-over-round bench comparison, drift-normalized when both artifacts
carry the calibration canary (calib_s, r10+).

Usage: bench_delta.py <old_bench.json> <new_bench.json> [topN]

For each query present in both artifacts prints the raw ratio new/old and,
when both sides have calib_s, the drift-normalized ratio
(new_s/new_calib) / (old_s/old_calib) — the number that survives a machine
slowdown. Artifacts without calib_s (pre-r10) get raw ratios only, with the
calibration caveat stated in the header.
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    oc, nc = old.get("calib_s"), new.get("calib_s")
    oq, nq = old["queries"], new["queries"]
    # per-query canary bases (r14): the sample nearest each query's winning
    # pass — preferred over the global min when BOTH sides carry it, so a
    # mid-run load spike normalizes the queries it actually hit
    oqc, nqc = old.get("query_calib") or {}, new.get("query_calib") or {}
    shared = sorted(set(oq) & set(nq))
    print(f"old: {sys.argv[1]} total={old['value']} calib_s={oc}")
    print(f"new: {sys.argv[2]} total={new['value']} calib_s={nc}")
    for side, art in (("old", old), ("new", new)):
        series = art.get("calib_series")
        if series:
            flat = [s for p in series for s in p]
            if flat:
                print(f"{side} mid-run canary swing: min={min(flat):.3f} "
                      f"max={max(flat):.3f} ({max(flat) / min(flat):.2f}x, "
                      f"{len(flat)} samples)")
    norm = oc is not None and nc is not None
    per_query_norm = bool(oqc) and bool(nqc)
    if not norm:
        print("NOTE: calib_s missing on one side — raw ratios only "
              "(machine drift not separable)")
    elif per_query_norm:
        print("normalization basis: PER-QUERY canary samples (both sides)")
    rows = []
    for q in shared:
        if oq[q] <= 0:
            continue
        raw = nq[q] / oq[q]
        nrm = None
        if norm:
            ob = oqc.get(q) if per_query_norm else None
            nb = nqc.get(q) if per_query_norm else None
            if ob and nb:
                nrm = (nq[q] / nb) / (oq[q] / ob)
            else:
                nrm = (nq[q] / nc) / (oq[q] / oc)
        rows.append((q, oq[q], nq[q], raw, nrm))
    if not rows:
        print("no comparable queries (no shared names with positive old "
              "timings) — nothing to rank")
        return
    key = 4 if norm else 3
    rows.sort(key=lambda r: r[key], reverse=True)
    ratios = sorted(r[key] for r in rows)
    n = len(ratios)
    med = ratios[n // 2]
    p10, p90 = ratios[n // 10], ratios[(9 * n) // 10]
    label = "normalized" if norm else "raw"
    print(f"{n} shared queries; {label} ratio median={med:.2f} "
          f"p10={p10:.2f} p90={p90:.2f}")
    drift = (nc / oc) if norm else None
    if drift is not None:
        print(f"machine drift (new_calib/old_calib): {drift:.2f}x")
    # second canary (r11+): the per-job scheduling floor. Iterative
    # (job-count-bound) tiers should be read against THIS drift — the
    # CPU-shaped calib_s over-corrects them when only the CPU got faster.
    oj, nj = old.get("calib_jobs_s"), new.get("calib_jobs_s")
    if oj and nj:
        print(f"job-floor drift (new_calib_jobs/old_calib_jobs): "
              f"{nj / oj:.2f}x — normalize iterative tiers by this one")
    print(f"\nworst {top_n} by {label} ratio:")
    for q, o, nv, raw, nrm in rows[:top_n]:
        extra = f" norm={nrm:5.2f}x" if norm else ""
        print(f"  {q:42s} {o:7.2f} -> {nv:7.2f} s raw={raw:5.2f}x{extra}")
    print(f"\nbest {top_n} by {label} ratio:")
    for q, o, nv, raw, nrm in rows[-top_n:]:
        extra = f" norm={nrm:5.2f}x" if norm else ""
        print(f"  {q:42s} {o:7.2f} -> {nv:7.2f} s raw={raw:5.2f}x{extra}")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"\nnew-only queries: {', '.join(only_new)}")


if __name__ == "__main__":
    main()
