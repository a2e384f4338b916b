"""Aggregate eval scores into LaTeX table rows.

Reference equivalent: `train/helpers/export_score_to_tex.py` (+_unanno):
walks task job dirs, reads each scores file, emits one metric row per
method/task in the paper's column order.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

# paper column order (`export_score_to_tex.py:7-23`)
METRIC_COLUMNS = [
    "fid",
    "alignment-LayoutGAN++",
    "overlay",
    "underlay_effectiveness_loose",
    "underlay_effectiveness_strict",
    "utilization",
    "occlusion",
    "unreadability",
    "validity",
]


def row_for(scores: dict, name: str) -> str:
    cells = []
    for m in METRIC_COLUMNS:
        if m in scores:
            v = scores[m]
            mean = v["mean"] if isinstance(v, dict) else v
            cells.append(f"{mean:.4f}")
        else:
            cells.append("--")
    return name + " & " + " & ".join(cells) + r" \\"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--jobs-root", required=True,
                   help="directory containing job dirs with generated_samples_*")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    lines = ["% " + " & ".join(["method/task"] + METRIC_COLUMNS)]
    for path in sorted(
        glob.glob(os.path.join(args.jobs_root, "*", "generated_samples_*",
                               "scores_all.json"))
    ):
        with open(path) as f:
            scores = json.load(f)
        job = os.path.basename(os.path.dirname(os.path.dirname(path)))
        task = os.path.basename(os.path.dirname(path)).replace(
            "generated_samples_", ""
        )
        lines.append(row_for(scores, f"{job}/{task}"))

    text = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
