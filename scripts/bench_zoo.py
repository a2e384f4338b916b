"""Per-family x per-task throughput sweep (VERDICT r3 item #4).

Runs `bench.bench_family` for every experiment preset and, for the AR
flagship, every task arm (incl. relation at default retries), printing a
markdown table for BENCH_NOTES.md plus one JSON line per row.

Usage: python scripts/bench_zoo.py [--batch 512] [--quick]

Operational note (remote-TPU tunnels): a single long-lived process
sweeping many families can hit transient tunnel wedges on a big compile
(observed once on the layoutdm row: blocked >30min, then the identical
row completed in ~2min from a fresh process).  When that happens, run the
rows as separate `python bench.py --family F --task T` invocations
(--only also narrows this sweep) — the r4 table in BENCH_NOTES.md was
collected that way.
"""

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_family  # noqa: E402

FAMILY_TASKS = [
    ("ralf", ["uncond", "c", "cwh", "partial", "refinement", "relation"]),
    ("autoreg", ["uncond"]),
    ("maskgit", ["uncond", "c"]),
    ("layoutdm", ["uncond", "c"]),
    ("vqdiffusion", ["uncond"]),
    ("cglgan", ["uncond"]),
    ("cglgan_ra", ["uncond"]),
    ("dsgan", ["uncond"]),
    ("icvt", ["uncond"]),
    ("retriever", ["uncond"]),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--quick", action="store_true",
                   help="one task per family, 2 iters")
    p.add_argument("--only", default=None, help="comma-separated families")
    args = p.parse_args()

    rows = []
    for family, tasks in FAMILY_TASKS:
        if args.only and family not in args.only.split(","):
            continue
        if args.quick:
            tasks = tasks[:1]
        for task in tasks:
            try:
                r = bench_family(family, task, args.batch,
                                 2 if args.quick else args.iters)
            except Exception as e:  # noqa: BLE001 — keep sweeping
                traceback.print_exc()
                r = {"family": family, "task": task, "B": args.batch,
                     "error": f"{type(e).__name__}: {e}"}
            print(json.dumps(r), flush=True)
            rows.append(r)

    print("\n| family | task | B | layouts/s/chip | ms/sample |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['family']} | {r['task']} | {r['B']} | ERROR | "
                  f"{r['error'][:60]} |")
        else:
            print(f"| {r['family']} | {r['task']} | {r['B']} | "
                  f"{r['layouts_per_sec']} | {r['ms_per_sample']} |")


if __name__ == "__main__":
    main()
