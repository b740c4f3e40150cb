"""One-family forward A/B on the zoo protocol, ignoring the results cache.

`zoo_bench.py` skips families already recorded, which is right for the sweep
but wrong for perf A/Bs. This runs `bench_family` for one family and prints
the row — combine with env flags and ABAB subprocess pairs per the
measurement discipline (benchmarks/RESULTS.md):

    for i in 1 2; do
      MICFORMER_MEDNEXT_WPACK=0 python benchmarks/ab_family.py mednext
      MICFORMER_MEDNEXT_WPACK=1 python benchmarks/ab_family.py mednext
    done
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zoo_bench import bench_family  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mednext"
    row = bench_family(name)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
