"""Aggregate assembly-bench / pairwise-probe JSON artifacts into the
PERFORMANCE.md markdown rows.

    python tools/asm_report.py TRG/asm_demo_*.json        # grid table
    python tools/asm_report.py --probe TRG/probe_*.json   # probe table

Pure host-side text tooling (no device use) — keeps the published tables
mechanically derived from the archived artifacts instead of hand-copied.
"""

import argparse
import json
import os


def _tag(d):
    bits = [d.get("algo", "?")]
    for key, label in (("measure_refine", "mr"), ("tta_gauges", "tta"),
                       ("cc_iters", "cc"), ("repair_iters", "rep"),
                       ("sync_iters", "sync"), ("polish_iters", "pol"),
                       ("beam_cuts", "beam"), ("base_k", "bk")):
        v = d.get(key)
        if v and not (key == "base_k" and d.get("algo") != "hierarchical") \
                and not (key == "beam_cuts" and v == 1):
            bits.append(f"{label}{v}")
    return "+".join(bits)


def grid_table(paths):
    rows = {}
    ks = set()
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        tag = _tag(d)
        rows[tag] = {r["k"]: r for r in d["rows"]}
        ks |= {r["k"] for r in d["rows"]}
    ks = sorted(ks)
    head = "| variant | " + " | ".join(f"K{k}" for k in ks) + " |"
    print(head)
    print("|" + "---|" * (len(ks) + 1))
    for tag, by_k in rows.items():
        cells = []
        for k in ks:
            r = by_k.get(k)
            cells.append("—" if r is None else
                         f"{r['success_rate']:.2f} ({r['cd_p50']:.3f})")
        print(f"| {tag} | " + " | ".join(cells) + " |")
    print("\ncells: success rate (cd p50); success bar = cd < 0.02")


def probe_table(paths):
    print("| run | K | chosen p50 | oracle p50 | <10deg | MST adj |")
    print("|---|---|---|---|---|---|")
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        tag = os.path.basename(p).replace(".json", "")
        extras = []
        if d.get("tta_gauges"):
            extras.append(f"tta{d['tta_gauges']}")
        if d.get("measure_refine"):
            extras.append(f"mr{d['measure_refine']}")
        tag += (" (" + "+".join(extras) + ")") if extras else ""
        for r in d["rows"]:
            print(f"| {tag} | {r['k']} | {r['chosen_p50']:.1f} "
                  f"| {r['oracle_p50']:.1f} "
                  f"| {r['frac_chosen_lt10deg']:.2f} "
                  f"| {r['mst_adjacent_frac']:.2f} |")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--probe", action="store_true",
                    help="inputs are pairwise_probe artifacts")
    ns = ap.parse_args(argv)
    if ns.probe:
        probe_table(ns.paths)
    else:
        grid_table(ns.paths)


if __name__ == "__main__":
    main()
