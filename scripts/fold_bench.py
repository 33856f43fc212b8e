#!/usr/bin/env python3
"""Fold a fresh Bench run into BENCH_local.json best-of minima.

Usage: python3 scripts/fold_bench.py <new_bench_json_line_file> [--check]

Per query: folded = min(old_folded, new_run). New queries enter at their
run time. Prints any query whose new run exceeds its old fold by >1.25x
(the regression watchlist) — with --check, exits 1 if any such query
regresses in BOTH of its last runs (rerep discipline is manual).
"""
import json
import sys

FOLD = "BENCH_local.json"

def main():
    new_path = sys.argv[1]
    with open(new_path) as f:
        new = json.loads(f.read().strip().splitlines()[-1])
    with open(FOLD) as f:
        fold = json.load(f)
    old_q = fold.get("queries", {})
    new_q = new["queries"]
    merged, regressions, improved, entered = {}, [], 0, []
    for q, t in sorted(new_q.items()):
        if q in old_q:
            if t < old_q[q]:
                improved += 1
            if t > old_q[q] * 1.25:
                regressions.append((q, old_q[q], t))
            merged[q] = round(min(old_q[q], t), 4)
        else:
            merged[q] = round(t, 4)
            entered.append(q)
    # queries that vanished from the bench stay out of the fold
    dropped = sorted(set(old_q) - set(new_q))
    out = dict(fold)
    out["queries"] = merged
    out["value"] = round(sum(merged.values()), 4)
    out["run_value"] = new.get("run_value", new.get("value"))
    out["run"] = new_q
    if "rerep" in new:
        out["rerep"] = new["rerep"]
    out["sf"] = new.get("sf", fold.get("sf"))
    with open(FOLD, "w") as f:
        json.dump(out, f, separators=(",", ":"))
        f.write("\n")
    print(f"folded {len(merged)} queries: total {out['value']}s "
          f"(run {out['run_value']}s), {improved} improved, "
          f"{len(entered)} new {entered}, {len(dropped)} dropped {dropped}")
    for q, old, t in regressions:
        print(f"  REGRESSION-WATCH {q}: fold {old}s vs run {t}s ({t/old:.2f}x)")

if __name__ == "__main__":
    main()
