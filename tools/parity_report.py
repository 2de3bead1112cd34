#!/usr/bin/env python
"""Render docs/parity_results.jsonl as the PARITY.md results table.

Each campaign line (one JSON object per config, appended by
tools/run_parity_campaign.sh) becomes one markdown row with the
two-proportion 3-sigma verdict. Later lines for the same config override
earlier ones (re-runs supersede).

Usage: python tools/parity_report.py [--jsonl docs/parity_results.jsonl]
Prints markdown to stdout; with --write, replaces the block between the
BEGIN/END GENERATED markers in docs/PARITY.md in place.
"""

from __future__ import annotations

import argparse
import json

# config -> (BASELINE.md row description, reference source)
DESCRIPTIONS = {
    "sw-shortened": (
        "[[144]] SW shortened `osd_window`, p=0.004, W=3",
        "Sliding Window OSD.ipynb cell 3",
    ),
    "sw-w4": ("[[144]] SW BP+OSD W=4, p=0.004", "SW OSD.ipynb cell 7"),
    "sw-w5": ("[[144]] SW BP+OSD W=5, p=0.004", "SW OSD.ipynb cell 8"),
    "sw-288-w4": (
        "[[288,12,18]] SW BP+OSD W=4, p=0.005, r=6",
        "SW OSD.ipynb cell a7760bc7",
    ),
    "global-144": (
        "[[144]] global BP+OSD-CS-10, p=0.004 (IBM Fig.3 repro)",
        "IBM.ipynb cell 3",
    ),
    "global-144-shortened": (
        "[[144]] global shortened OSD, p=0.004",
        "IBM.ipynb cell 5",
    ),
    "global-144-p003": (
        "[[144]] global BP+OSD-CS-10, p=0.003",
        "IBM.ipynb cell 4",
    ),
    "sw-p003-w3": ("[[144]] SW BP+OSD W=3, p=0.003", "SW OSD.ipynb cell 10"),
    "sw-p003-w4": ("[[144]] SW BP+OSD W=4, p=0.003", "SW OSD.ipynb cell 11"),
    "sw-p003-w5": ("[[144]] SW BP+OSD W=5, p=0.003", "SW OSD.ipynb cell 12"),
    "gdg-144-w3": (
        "[[144]] SW GDG W=3, p=0.005, pre-BP 8",
        "SW GDG.ipynb cell 433676ab",
    ),
    "gdg-288-41": (
        "[[288]] (W,F)=(4,1) GDG, p=0.005, r=18",
        "SW GDG.ipynb cell f83f0070",
    ),
    "gdg-144-52": (
        "[[144]] (W,F)=(5,2) GDG, p=0.005, r=12",
        "SW GDG.ipynb cell d9a942ed",
    ),
    "gdg-last-osd": (
        "[[288]] W=4 r=6 GDG, p=0.005 (plain row; +last-win-OSD in extra)",
        "SW GDG.ipynb cell ccb3047b",
    ),
    "cc-osd0": (
        "code-capacity [[288]] p=0.02, BP+OSD-0",
        "Data noise.ipynb cell 9",
    ),
    "cc-osdcs": (
        "code-capacity [[288]] p=0.02, BP+OSD-CS-10",
        "Data noise.ipynb cell 9",
    ),
    "cc-gdg": (
        "code-capacity [[288]] p=0.02, GDG low-error-mode",
        "Data noise.ipynb cell 9",
    ),
    "cc882-bpgd-all": (
        "code-capacity [[882,24]] p=0.04, BPGD (all VNs)",
        "Misc.ipynb cell 10",
    ),
    "cc882-bpgd-partial": (
        "code-capacity [[882,24]] p=0.04, BPGD (max_step=100)",
        "Misc.ipynb cell 10",
    ),
    "cc882-osd0": (
        "code-capacity [[882,24]] p=0.04, BP+OSD-0",
        "Misc.ipynb cell 10",
    ),
    "cc882-osdcs": (
        "code-capacity [[882,24]] p=0.04, BP+OSD-CS-10",
        "Misc.ipynb cell 10",
    ),
    "cc882-gdg": (
        "code-capacity [[882,24]] p=0.04, GDG",
        "Misc.ipynb cell 10",
    ),
    "camel-362": (
        "CAMEL [[362,36,20]] depolarizing p=0.02",
        "Misc.ipynb cell 8",
    ),
    "phenom-osd": (
        "phenomenological [[288]] p=0.03 p_synd=1e-3, BP+OSD",
        "Syndrome code.ipynb cell 4",
    ),
    "phenom-gdg": (
        "phenomenological [[288]] p=0.03 p_synd=1e-3, GDG",
        "Syndrome code.ipynb cell 4",
    ),
    "bp4-osd0": (
        "BP4+OSD-0 [[882,24]] depolarizing p=0.1",
        "Misc.ipynb cell 2",
    ),
    "bp4-osdcs": (
        "BP4+OSD-CS-10 [[882,24]] depolarizing p=0.1",
        "Misc.ipynb cell 2",
    ),
    "shyps-window": (
        "SHYPS r=3 window (W,F)=(3,1), p=0.001, r=4, BP+OSD-0",
        "SHYPS.ipynb cell 2",
    ),
    "shyps-global": (
        "SHYPS r=3 global, p=0.001, r=4, BP+OSD-0",
        "SHYPS.ipynb cell 3",
    ),
    "sw-xbasis": (
        "[[144]] SW BP+OSD W=3, p=0.004, x-basis — CONSISTENCY CHECK, not "
        "parity: no committed x-basis reference number exists; compared "
        "against the z-basis count (X/Z memories are statistically equal)",
        "build_circuit.py:6 z_basis=False",
    ),
}


def fmt_rate(fails, shots):
    if shots:
        return f"{fails}/{shots} ({fails / shots:.3g})"
    return "—"


BEGIN_MARK = "<!-- BEGIN GENERATED PARITY TABLE (tools/parity_report.py) -->"
END_MARK = "<!-- END GENERATED PARITY TABLE -->"


def render(jsonl_path: str) -> str:
    rows: dict[str, dict] = {}
    with open(jsonl_path) as fh:
        for line in fh:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "config" in d and "fails" in d:
                rows[d["config"]] = d

    out = ["| workload | reference LER | this framework | shots/s | verdict |"]
    out.append("|---|---|---|---|---|")
    for cfg, (desc, src) in DESCRIPTIONS.items():
        d = rows.get(cfg)
        if d is None:
            out.append(f"| {desc} ({src}) | — | — | — | not yet run |")
            continue
        verdict = "✔ within 3σ" if d.get("z3_compatible") else "✘ OUTSIDE 3σ"
        ref = fmt_rate(d.get("ref_fails"), d.get("ref_shots"))
        ours = fmt_rate(d.get("fails"), d.get("shots"))
        extra = ""
        if "last_win_osd_fails" in d:
            ok = "✔" if d.get("last_win_osd_z3_compatible") else "✘"
            extra = f" (+last-win-OSD {d['last_win_osd_fails']}/{d['shots']} {ok})"
        out.append(
            f"| {desc} ({src}) | {ref} | {ours}{extra} | "
            f"{d.get('shots_per_sec', '—')} | {verdict} |"
        )

    done = sum(1 for c in DESCRIPTIONS if c in rows)
    ok = sum(1 for c in DESCRIPTIONS if rows.get(c, {}).get("z3_compatible"))
    out.append("")
    out.append(f"{done}/{len(DESCRIPTIONS)} configs measured, {ok} within 3σ.")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default="docs/parity_results.jsonl")
    ap.add_argument(
        "--write",
        metavar="MD",
        nargs="?",
        const="docs/PARITY.md",
        help="replace the generated block in MD (default docs/PARITY.md)",
    )
    args = ap.parse_args()

    table = render(args.jsonl)
    if not args.write:
        print(table)
        return
    with open(args.write) as fh:
        doc = fh.read()
    if BEGIN_MARK not in doc or END_MARK not in doc:
        raise SystemExit(f"{args.write}: BEGIN/END GENERATED markers not found")
    head, rest = doc.split(BEGIN_MARK, 1)
    _, tail = rest.split(END_MARK, 1)
    doc = head + BEGIN_MARK + "\n" + table + "\n" + END_MARK + tail
    with open(args.write, "w") as fh:
        fh.write(doc)
    print(f"updated {args.write}")


if __name__ == "__main__":
    main()
