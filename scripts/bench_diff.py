#!/usr/bin/env python3
"""Cross-round bench comparison implementing the README's two-step
noise rule in one command (round 13):

    python3 scripts/bench_diff.py OLD_bench_out.json NEW_bench_out.json

Step 1 — ambient factors: prints each artifact's calibration line
(factor median + per-probe factors) if present; a sustained factor
>= ~1.3 marks that artifact load-contaminated — normalize or rerun.

Step 2 — per-query uniformity: a UNIFORM per-query ratio across
queries neither round touched is machine weather (host CPU wanders a
~±25% band between quiet windows — measured round 13); a CONCENTRATED
ratio is a code signal. Queries moving >= max(2x, 2x the median
ratio) are listed as candidates; per the standing rule each candidate
is only real if it reproduces under an isolated
`graft.Bench q_name` re-run (suite position alone manufactures 2-3x).

Inputs are bench_out.json-style files: one JSON object per line, the
per-query min map on the line with "metric":"queries".
"""
import json
import statistics
import sys


def load(path):
    queries, calib, total = {}, None, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            m = d.get("metric")
            if m == "queries":
                queries = d["queries"]
            elif m == "calibration":
                calib = d
            elif m == "total":
                total = d
    if not queries:
        sys.exit(f"{path}: no per-query map found (need the "
                 '"metric":"queries" line of a bench_out.json)')
    return queries, calib, total


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old_q, old_c, old_t = load(sys.argv[1])
    new_q, new_c, new_t = load(sys.argv[2])

    factors = {}
    for tag, c, t in (("OLD", old_c, old_t), ("NEW", new_c, new_t)):
        tot = f"total={t['value']:.1f}s n={t.get('n_queries')}" if t else ""
        if c:
            fs = c.get("ambient_factor", [])
            # one median for both the print and the flag (r13 advice:
            # the old upper-median flag could disagree with the printed
            # interpolated value exactly at the 1.3 boundary)
            med = statistics.median(fs) if fs else float("nan")
            factors[tag] = med
            flag = "  ** LOAD-CONTAMINATED (sustained >=1.3) **" \
                if fs and med >= 1.3 else ""
            print(f"[{tag}] {tot}  ambient_factor median={med:.3f} "
                  f"probes={['%.2f' % f for f in fs]}{flag}")
        else:
            print(f"[{tag}] {tot}  (no calibration line — pre-r13 artifact)")

    common = sorted(set(old_q) & set(new_q))
    only_old = sorted(set(old_q) - set(new_q))
    only_new = sorted(set(new_q) - set(old_q))
    # timings <= 0 are error sentinels (-1.0): excluded from ratios AND
    # from the totals (r13 advice: summing sentinels skewed the totals)
    valid = [q for q in common if old_q[q] > 0 and new_q[q] > 0]
    ratios = {q: new_q[q] / old_q[q] for q in valid}
    print(f"\ncommon={len(common)} (+{len(only_new)} new, "
          f"-{len(only_old)} removed, {len(common) - len(valid)} with "
          "error sentinels excluded)")
    if not ratios:
        print("no comparable common queries (disjoint sets or all error "
              "sentinels) — nothing to adjudicate")
        print("VERDICT: NOT-COMPARABLE")
        return
    rs = sorted(ratios.values())
    med = statistics.median(rs)
    mean = statistics.mean(rs)
    q1, q3 = rs[len(rs) // 4], rs[3 * len(rs) // 4]
    print(f"per-query ratio: median={med:.3f} mean={mean:.3f} "
          f"IQR=[{q1:.3f}, {q3:.3f}]")
    print(f"common totals (sentinel-free): "
          f"{sum(old_q[q] for q in valid):.1f}s -> "
          f"{sum(new_q[q] for q in valid):.1f}s "
          f"(x{sum(new_q[q] for q in valid) / sum(old_q[q] for q in valid):.3f}); "
          f"median-normalized residual per query is the code signal")

    thresh = max(2.0, 2.0 * med)
    up = [(r, q) for q, r in ratios.items() if r >= thresh]
    down = [(r, q) for q, r in ratios.items()
            if r <= med / 2.0 and new_q[q] + old_q[q] > 0.5]
    if up:
        print(f"\nregression candidates (ratio >= {thresh:.2f} — real ONLY "
              "if reproduced by an isolated `graft.Bench q_name` re-run):")
        for r, q in sorted(up, reverse=True):
            print(f"  {q:32s} {old_q[q]:7.2f}s -> {new_q[q]:7.2f}s  x{r:.2f}")
    else:
        print(f"\nno regression candidates (no ratio >= {thresh:.2f}): "
              "the drift is UNIFORM — machine weather, not code")
    if down:
        print("improvements >= 2x below the median (likely real, same "
              "isolated-rerun rule):")
        for r, q in sorted(down):
            print(f"  {q:32s} {old_q[q]:7.2f}s -> {new_q[q]:7.2f}s  x{r:.2f}")

    # one quotable line for the round log (r13 verdict #4)
    def fstr(tag):
        return f"{factors[tag]:.3f}" if tag in factors else "n/a"
    print(f"\nVERDICT: factors old={fstr('OLD')} new={fstr('NEW')} | "
          f"median=x{med:.3f} "
          f"drift={'CONCENTRATED' if up else 'UNIFORM'} | "
          f"candidates={sorted(q for _, q in up)} "
          f"improvements={sorted(q for _, q in down)}")


if __name__ == "__main__":
    main()
