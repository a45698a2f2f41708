"""Collect final val metrics from runs/orderings/*/csv/metrics.csv into a
markdown table (reproduces the reference README's experiment orderings on
the synthetic corpus; ref README.md:64-290)."""
import csv
import sys
from pathlib import Path

ORDER = [
    ("baseline", "yv5s + mosaic (baseline)"),
    ("no_mosaic", "no mosaic"),
    ("mixup01", "+ mixup p=0.1"),
    ("mixup02", "+ mixup p=0.2"),
    ("mixup03", "+ mixup p=0.3"),
    ("class_aware", "+ class-aware sampling"),
    ("rf_mean", "+ repeat-factor (mean)"),
    ("rf_max", "+ repeat-factor (max)"),
    ("loss_weights", "+ per-class loss weights"),
]

def last_val(path):
    rows = list(csv.DictReader(open(path)))
    vals = [r for r in rows if r.get("map")]
    if not vals:
        return None
    r = vals[-1]
    per_class = {
        k: float(v) for k, v in r.items() if k.startswith("map50_class_") and v
    }
    return float(r["map"]), float(r["map50"]), per_class

def main(root="runs/orderings"):
    print("| preset | mAP (avg .3/.5/.75/.9) | mAP50 | tail classes (AP50 c7/c8/c9) |")
    print("|---|---|---|---|")
    for name, desc in ORDER:
        p = Path(root) / name / "csv" / "metrics.csv"
        if not p.exists():
            print(f"| {desc} | (missing) | | |")
            continue
        res = last_val(p)
        if res is None:
            print(f"| {desc} | (no val rows) | | |")
            continue
        m, m50, pc = res
        tail = "/".join(
            f"{pc.get(f'map50_class_{i}', float('nan')):.3f}" for i in (7, 8, 9)
        )
        print(f"| {desc} | {m:.4f} | {m50:.4f} | {tail} |")

if __name__ == "__main__":
    main(*sys.argv[1:])
