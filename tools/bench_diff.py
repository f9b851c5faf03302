#!/usr/bin/env python3
"""Diff two Bench JSON artifacts (BENCH_r{N}.json / bench_full.json).

Usage: python3 tools/bench_diff.py <old.json> <new.json> [ratio]

Prints per-query regressions where new/old exceeds `ratio` (default 2.0)
and a total/entry-count summary — the per-query half of the judge's
2x-bar check, runnable locally before a round closes. Queries absent
from either side are listed as added/removed, not compared. Sub-100ms
entries are skipped (pure noise at bench resolution).
"""
import json
import sys


def load(path):
    """Accept any of the three artifact shapes: the raw Bench JSON line
    (bench_full.json), the driver wrapper with a full `parsed` object, or
    the driver wrapper with only a truncated 2000-char `tail` — for the
    last, recover the per-query pairs present in the fragment (partial
    coverage; absent queries just aren't compared)."""
    import re
    with open(path) as f:
        text = f.read()
    d = json.loads(text[text.index("{"):])
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    tail = d.get("tail", "")
    qs = {m.group(1): float(m.group(2))
          for m in re.finditer(r'"(q[0-9]+[a-z]*)":([0-9.]+)', tail)}
    tot = re.search(r'"value":([0-9.]+)', tail)
    print(f"note: {path} is a truncated driver tail — "
          f"recovered {len(qs)} query entries")
    return {"value": float(tot.group(1)) if tot else float("nan"),
            "queries": qs}


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    oq, nq = old["queries"], new["queries"]
    print(f"old: {old['value']:.1f}s / {len(oq)} queries   "
          f"new: {new['value']:.1f}s / {len(nq)} queries")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    regressions = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a >= 0.1 and b > a * ratio:
            regressions.append((b / a, name, a, b))
    for r, name, a, b in sorted(regressions, reverse=True):
        print(f"REGRESSION {name}: {a:.2f}s -> {b:.2f}s ({r:.1f}x)")
    if not regressions:
        print(f"no per-query regression over {ratio}x")
    shared = set(oq) & set(nq)
    tot_old = sum(oq[n] for n in shared)
    tot_new = sum(nq[n] for n in shared)
    print(f"shared-entry totals: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x)")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
