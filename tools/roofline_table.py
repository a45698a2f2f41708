"""Emit the ROOFLINE.md per-fusion table from a profile_step.py --json-out.

Usage: python tools/roofline_table.py /tmp/prof640b.json [--top 20]
Prints a markdown table: op, ms/step, GB/step, achieved GB/s, % of peak HBM
bw, and % of minimal-traffic time (cost-model bytes / peak bw / measured
time) — the "how close to speed-of-light" column.
"""

from __future__ import annotations

import argparse
import json

PEAK = 819.0  # v5e HBM GB/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("json_path")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    d = json.load(open(args.json_path))
    ops = sorted(d["ops"], key=lambda o: -o["ms"])[: args.top]
    tot_ms = d["ms_per_step"]
    tot_gb = d["gb_per_step"]
    print(f"Step: {tot_ms:.2f} ms | cost-model traffic {tot_gb:.2f} GB "
          f"-> minimal-time floor {tot_gb / PEAK * 1000:.1f} ms at "
          f"{PEAK:.0f} GB/s | achieved {tot_gb / tot_ms * 1000:.0f} GB/s "
          f"({100 * tot_gb / tot_ms * 1000 / PEAK:.0f}% of peak)\n")
    print("| op | ms/step | GB/step | GB/s | % peak bw | % of minimal time |")
    print("|---|---|---|---|---|---|")
    for o in ops:
        name = o["name"].split(" = ")[0].lstrip("%")
        gb = o["bytes"] / 1e9
        ms = o["ms"]
        gbps = gb / ms * 1000 if ms else 0.0
        minimal_ms = gb / PEAK * 1000
        eff = 100 * minimal_ms / ms if ms else 0.0
        print(f"| `{name[:42]}` | {ms:.2f} | {gb:.3f} | {gbps:.0f} | "
              f"{100 * gbps / PEAK:.0f}% | {eff:.0f}% |")
    covered = sum(o["ms"] for o in ops)
    print(f"\nTop-{args.top} cover {covered:.1f} ms = "
          f"{100 * covered / tot_ms:.0f}% of the step.")


if __name__ == "__main__":
    main()
