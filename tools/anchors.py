#!/usr/bin/env python3
"""Consolidate the bench anchor series into ANCHORS.json.

Sources, best-first per round:
  - target/bench.json        -- the full one-line JSON the bench main
                                writes; survives only for the latest
                                official run, so it is captured into
                                ANCHORS.json each round before the next
                                run overwrites it.
  - BENCH_r{N}.json 'parsed' -- the driver's compact line (total, no
                                per-query map).
  - BENCH_r{N}.json 'tail'   -- the last ~2000 chars of driver-captured
                                output; recovers the LATE-alphabet part
                                of the per-query map for older rounds
                                (the front was truncated by the tail
                                buffer -- the reason the compact line
                                exists). Partial coverage is recorded
                                as such, never padded.

Re-run each round AFTER the official bench lands:
    python3 tools/anchors.py
It merges into the existing ANCHORS.json (existing full rounds are
never downgraded to partial) so the series accumulates. 'calib' (three
per-pass timings of a fixed data-independent workload, added to Bench
in round 10) is the host-load marker: same-code total drift with calib
drifting alongside = host interference; calib flat = a plan moved.
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def from_tail(tail: str):
    """Recover (queries, total, calib) from a truncated output tail."""
    pairs = re.findall(r'"(q[a-z0-9_]+)":(-?[0-9.]+)', tail or "")
    seen = {}
    for k, v in pairs:
        if k not in seen:  # full line precedes its compact/stderr repeats
            seen[k] = float(v)
    m = re.search(r'"metric":"total","value":([0-9.]+)', tail or "")
    total = float(m.group(1)) if m else None
    c = re.search(r'"calib":\[([0-9.,]+)\]', tail or "")
    calib = [float(x) for x in c.group(1).split(",")] if c else None
    return seen, total, calib


def main():
    out_path = os.path.join(REPO, "ANCHORS.json")
    anchors = {"rounds": {}}
    if os.path.exists(out_path):
        anchors = json.load(open(out_path))

    rounds = anchors.setdefault("rounds", {})
    bench_files = sorted(
        f for f in os.listdir(REPO) if re.fullmatch(r"BENCH_r\d+\.json", f))
    latest = bench_files[-1] if bench_files else None

    for f in bench_files:
        n = int(re.search(r"\d+", f).group())
        key = f"r{n:02d}"
        d = json.load(open(os.path.join(REPO, f)))
        parsed = d.get("parsed") or {}
        tail_q, tail_total, tail_calib = from_tail(d.get("tail"))
        entry = {
            "rc": d.get("rc"),
            "cpus": d.get("cpus"),
            "sf": d.get("sf"),
            "total": parsed.get("value", tail_total),
            "calib": parsed.get("calib", tail_calib),
            "queries": tail_q,
            "coverage": "partial-tail",
            "n_queries": len(tail_q),
        }
        # The latest round can take the FULL per-query map from the
        # bench main's own full-line copies (same run: totals must
        # agree to the ns). BENCH_OFFICIAL.json is the committed copy
        # (round 13+); target/bench.json the gitignored original.
        if f == latest:
            for bj in (os.path.join(REPO, "BENCH_OFFICIAL.json"),
                       os.path.join(REPO, "target", "bench.json")):
                if not os.path.exists(bj):
                    continue
                full = json.load(open(bj))
                if full.get("value") == entry["total"]:
                    entry["queries"] = full["queries"]
                    entry["coverage"] = "full"
                    entry["n_queries"] = len(full["queries"])
                    if "calib" in full:
                        entry["calib"] = full["calib"]
                    break
        prev = rounds.get(key)
        if prev and prev.get("coverage") == "full" and entry["coverage"] != "full":
            continue  # never downgrade an accumulated full round
        rounds[key] = entry

    with open(out_path, "w") as fh:
        json.dump(anchors, fh, indent=1, sort_keys=True)
    full_n = sum(1 for r in rounds.values() if r["coverage"] == "full")
    print(f"ANCHORS.json: {len(rounds)} rounds ({full_n} full), "
          f"latest={latest}")


if __name__ == "__main__":
    sys.exit(main())
