"""One-off: measure the flagship sample path at B=4096 (decode at 4096,
encode chunked at 1024) vs the adopted B=2048 config.

Imports the setup + timed loop from bench.py so it always measures the
adopted config (kv_quant, ENC_CHUNK, HW, sampling) rather than a copied
snapshot of it, and so the memoization-hygiene AssertionError propagates
instead of printing as a generic failure (ADVICE r2).

Usage: python scripts/bench_b4096.py [batch sizes...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> None:
    import jax

    batches = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    setup = bench.build_flagship()
    for B in batches:
        try:
            tput, times = bench.timed_throughput(setup, B)
        except jax.errors.JaxRuntimeError as e:  # OOM — report and continue
            print(f"B={B}: FAILED ({type(e).__name__}: {e})")
            continue
        print(f"B={B}: {tput:.1f} layouts/s "
              f"(times: {[round(t * 1e3, 1) for t in times]})")


if __name__ == "__main__":
    main()
