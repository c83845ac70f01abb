#!/usr/bin/env python3
"""Compare two Bench JSON lines per query (ROADMAP: compare per-query
medians round over round, never totals — totals drift with suite size
and machine load).

Usage: python3 scripts/bench_diff.py OLD.json NEW.json [threshold]

Prints queries whose median moved more than `threshold` (default 1.5x)
in either direction, plus new/removed queries and shuffle deltas.
"""
import json
import sys


def load(path):
    """Merge every metric line into one dict: bench_out.json carries the
    per-query map, the min map, the shuffle map, and the `total` line
    (with `value`) on SEPARATE lines — grabbing only the first line
    used to KeyError on `value` for working-tree artifacts (r13)."""
    merged = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            i = line.find('{"metric"')
            if i < 0:
                continue
            try:
                d = json.loads(line[i:])
            except json.JSONDecodeError:
                continue
            merged.update(d)
    if not merged:
        raise SystemExit(f"no bench JSON line in {path}")
    return merged


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    osh, nsh = old.get("shuffle_mb", {}), new.get("shuffle_mb", {})
    print(f"old total {old['value']:.1f}s ({len(oq)} queries)  "
          f"new total {new['value']:.1f}s ({len(nq)} queries)")
    for name in sorted(set(nq) - set(oq)):
        print(f"  NEW      {name:28s} {nq[name]:6.2f}s")
    for name in sorted(set(oq) - set(nq)):
        print(f"  REMOVED  {name:28s} was {oq[name]:6.2f}s")
    moved = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0 or b <= 0:
            print(f"  FAILED   {name:28s} old={a} new={b}")
            continue
        ratio = b / a
        if ratio > thresh or ratio < 1 / thresh:
            moved.append((ratio, name, a, b))
    for ratio, name, a, b in sorted(moved, reverse=True):
        arrow = "SLOWER" if ratio > 1 else "faster"
        sh = ""
        if name in osh and name in nsh and (osh[name] or nsh[name]):
            sh = f"  shuffle {osh[name]:.1f}->{nsh[name]:.1f} MB"
        print(f"  {arrow}   {name:28s} {a:6.2f}s -> {b:6.2f}s ({ratio:4.2f}x){sh}")
    if not moved:
        print(f"  no query moved more than {thresh}x")


if __name__ == "__main__":
    main()
