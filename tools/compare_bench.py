#!/usr/bin/env python3
"""Diff two bench records: full bench_local.json files OR the driver's
truncated BENCH_r{N}.json artifacts (whose "tail" field clips the
alphabetically-early half and escapes quotes). Shared-query totals,
ratio, and the biggest movers — the round-over-round comparison the
judge computes, runnable locally.

Usage: python3 tools/compare_bench.py <old.json> <new.json> [top_n]
"""
import sys, json, re


def load(path):
    raw = open(path).read()
    try:
        j = json.loads(raw)
        if isinstance(j, dict) and isinstance(j.get("queries"), dict):
            return {k: float(v) for k, v in j["queries"].items() if float(v) >= 0}
    except Exception:
        pass
    # driver artifact: regex the (possibly escaped) "name":seconds pairs
    pairs = re.findall(r'\\?"([a-z0-9_]+)\\?":(-?[0-9.]+)', raw)
    out = {}
    for k, v in pairs:
        try:
            f = float(v)
        except ValueError:
            continue
        if f >= 0 and not k.isdigit():
            out[k] = f
    # drop metadata keys that match the pattern
    for meta in ("n", "rc", "cpus", "sf", "value", "warmup", "iterations"):
        out.pop(meta, None)
    return out


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    old, new = load(old_p), load(new_p)
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared queries"); sys.exit(1)
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    print(f"shared={len(shared)}  old={t_old:.1f}s  new={t_new:.1f}s  "
          f"ratio={t_new / t_old:.2f}")
    moves = sorted(((new[k] - old[k], k) for k in shared))
    print("improved:")
    for d, k in moves[:top_n]:
        if d < 0:
            print(f"  {k:32s} {old[k]:7.2f} -> {new[k]:7.2f}")
    print("regressed:")
    for d, k in reversed(moves[-top_n:]):
        if d > 0:
            print(f"  {k:32s} {old[k]:7.2f} -> {new[k]:7.2f}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new queries ({len(only_new)}): {', '.join(only_new)}")


if __name__ == "__main__":
    main()
