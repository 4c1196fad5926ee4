"""Extract a metrics-vs-steps markdown table from a training log.

Training logs interleave `saved model to <dir> at step N with loss L`
lines with the printed eval-metric dicts; this collects them into the
table format docs/accuracy.md uses (VERDICT r4 item 4: the accuracy-gap
calibration needs MSE5/MSE10-vs-steps, not just the final row).

Usage: python scripts/extract_eval_table.py <train.log> [keys...]
Default keys: val/loss val/mse1 val/mse5 val/mse10
"""

import ast
import re
import sys


def main():
    path = sys.argv[1]
    keys = sys.argv[2:] or ["val/loss", "val/mse1", "val/mse5", "val/mse10"]
    step = None
    rows = []
    for line in open(path):
        m = re.match(r"saved model to \S+ at step (\d+)", line)
        if m:
            step = int(m.group(1))
            continue
        if line.startswith("{'val/") and step is not None:
            try:
                d = ast.literal_eval(line.strip())
            except (ValueError, SyntaxError):
                continue
            rows.append((step, d))
            step = None
    print("| step | " + " | ".join(k.split("/")[-1] for k in keys) + " |")
    print("|" + "---|" * (len(keys) + 1))
    for s, d in rows:
        cells = [f"{d[k]:.4g}" if k in d else "-" for k in keys]
        print(f"| {s} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
