"""One-off: ENC_CHUNK sweep at B=4096 under the r5 chunked schedule,
all arms in ONE session so run-to-run tunnel variance can't reorder them.

The chunk size sets BOTH the encode working set and the per-decode KV
working set under the chunked schedule, so the r1 choice (1024, picked
for the whole-batch-decode schedule) deserves a re-sweep.

Usage: python scripts/sweep_enc_chunk.py [chunk sizes...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    chunks = [int(a) for a in sys.argv[1:]] or [1024, 512, 256]
    B = int(os.environ.get("SWEEP_B", "4096"))
    import bench

    for ch in chunks:
        os.environ["RALF_BENCH_ENC_CHUNK"] = str(ch)
        setup = bench.build_flagship()
        tput, times = bench.timed_throughput(setup, B)
        print(json.dumps({"enc_chunk": ch, "B": B,
                          "layouts_per_sec": round(tput, 1),
                          "times_ms": [round(t * 1e3, 1) for t in times]}),
              flush=True)
        del setup


if __name__ == "__main__":
    main()
