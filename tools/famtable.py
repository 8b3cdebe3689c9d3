#!/usr/bin/env python3
"""Collapse per-query bench JSONs into the SCALE.md family table.

Usage: tools/famtable.py BENCH_SF0001.json BENCH_SF001.json BENCH_FULL.json
Prints a markdown table with one row per operator family and the
cross-SF wall-clock ratios (100x data span across the three points).
"""
import json
import re
import sys


def family(q: str) -> str:
    if q.startswith("s") and re.match(r"s\d", q):
        return "streaming"
    if q.startswith("dedup_") or q.startswith("pipe_"):
        return "dedup + pipeline composes"
    if q.startswith("ann_") or q.startswith("v_"):
        return "vector/ANN (rungs, training, mining)"
    if re.match(r"q\d+_", q):
        return "TPC-H decision support"
    if q.startswith("t_"):
        return "text + sketches + packing + chunking + mixing"
    if q.startswith("q_"):
        return "analytics/window/asof/sketch aggs"
    if re.match(r"j\d", q) or q in ("d1_latest_by_key", "d2_latest_by_key_id"):
        return "versioned joins (batch)"
    if q.startswith("m_"):
        return "multimodal"
    return "other"


def load(path):
    with open(path) as fh:
        return json.load(fh)["queries"]


def load_totals(path):
    """(min-total, median-total) — median present from r19 artifacts."""
    with open(path) as fh:
        d = json.load(fh)
    return d.get("value"), d.get("value_median")


def ratio(num, den):
    return f"{num / den:.2f}" if den > 0 else "n/a"


def main():
    a, b, c = sys.argv[1], sys.argv[2], sys.argv[3]
    qa = load(a)
    qb = load(b)
    qc = load(c)
    common = sorted(set(qa) & set(qb) & set(qc))
    missing = sorted((set(qa) | set(qb) | set(qc)) - set(common))
    if missing:
        print(f"(not in all three runs, excluded: {missing})")
    fams = {}
    for q in common:
        f = family(q)
        fams.setdefault(f, [0, 0.0, 0.0, 0.0])
        fams[f][0] += 1
        fams[f][1] += qa[q]
        fams[f][2] += qb[q]
        fams[f][3] += qc[q]
    print("| Family | n | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | "
          "ratio 10x | ratio 100x |")
    print("|---|---|---|---|---|---|---|")
    rows = sorted(fams.items(), key=lambda kv: -kv[1][3])
    tn, t1, t2, t3 = 0, 0.0, 0.0, 0.0
    for f, (n, s1, s2, s3) in rows:
        tn += n; t1 += s1; t2 += s2; t3 += s3
        print(f"| {f} | {n} | {s1:.1f} | {s2:.1f} | {s3:.1f} | "
              f"{ratio(s3, s2)} | {ratio(s3, s1)} |")
    print(f"| **total** | {tn} | {t1:.1f} | {t2:.1f} | {t3:.1f} | "
          f"**{ratio(t3, t2)}** | **{ratio(t3, t1)}** |")
    print()
    # the min totals above are what the family table sums; the median
    # totals (recorded from r19 on) are the noise-robust comparator —
    # print both whenever the artifacts carry them
    meds = [load_totals(p) for p in (a, b, c)]
    if all(m is not None for _, m in meds):
        print("median totals (sum of per-query medians): " +
              " / ".join(f"{m:.1f}s" for _, m in meds) +
              "  (min totals: " +
              " / ".join(f"{v:.1f}s" for v, _ in meds) + ")")
    print("steepest individual queries sf0.01 -> sf0.1:")
    ratios = sorted(((qc[q] / qb[q], q) for q in common if qb[q] > 0.2),
                    reverse=True)[:8]
    for r, q in ratios:
        print(f"  {q}: {qb[q]:.2f}s -> {qc[q]:.2f}s ({r:.1f}x)")


if __name__ == "__main__":
    main()
