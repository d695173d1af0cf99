#!/usr/bin/env python3
"""Per-query bench regression net: compare two Bench JSON outputs.

Usage: tools/bench_diff.py OLD.json NEW.json [ratio_threshold=2.0]

Accepts either a raw Bench line ({"metric": ..., "queries": {...}}) or a
driver BENCH_r*.json wrapper (whose "tail" embeds the line). Exits 1 when
any shared query slowed by more than the threshold AND by more than 1s
absolute (sub-second queries jitter), so CI-style use is possible.
"""
import json
import re
import sys


def load_queries(path):
    with open(path) as f:
        data = json.load(f)
    if "queries" in data:
        return data["queries"]
    if isinstance(data.get("parsed"), dict) and "queries" in data["parsed"]:
        return data["parsed"]["queries"]
    # greedy: the line nests a {"queries": {...}} object
    m = re.search(r'\{"metric".*\}', data.get("tail", ""))
    if m:
        return json.loads(m.group(0))["queries"]
    raise SystemExit(f"no queries found in {path}")


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    old, new = load_queries(old_path), load_queries(new_path)
    shared = sorted(set(old) & set(new))
    regressed = []
    print(f"{'query':<28} {'old':>7} {'new':>7} {'ratio':>6}")
    for q in shared:
        o, n = old[q], new[q]
        ratio = n / o if o > 0 else float("inf")
        flag = ""
        if ratio > threshold and n - o > 1.0:
            regressed.append(q)
            flag = "  <-- REGRESSED"
        if ratio > threshold or ratio < 1 / threshold or n - o > 1.0:
            print(f"{q:<28} {o:>7.2f} {n:>7.2f} {ratio:>6.2f}{flag}")
    print(f"\ntotals: old {sum(old[q] for q in shared):.1f}s"
          f" -> new {sum(new[q] for q in shared):.1f}s over {len(shared)} shared queries;"
          f" {len(set(new) - set(old))} added, {len(set(old) - set(new))} removed")
    if regressed:
        print(f"REGRESSIONS (> {threshold}x and > 1s): {', '.join(regressed)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
