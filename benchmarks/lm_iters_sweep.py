"""AR-gated LM-iteration budget sweep on the cross-parity world.

Round-4's AR-gated sweep halved the RANSAC hypothesis budget
(docs/KERNELS.md §5); this applies the same method to the winner's
Levenberg-Marquardt iteration count (shipped default 10). Measured
round-5 verdict: AR is bit-identical across lm_iters ∈ {2..10} — the LM
converges in ≤2 iterations on these correspondence sets — so the knob is
NOT a lever (artifact benchmarks/results/lm_iters_sweep_r05.json).

Usage: python benchmarks/lm_iters_sweep.py [--crops 200] [--seeds 2]
Prints one JSON line with the per-cell AR table and the picked budget.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solve_sweep_harness import emit, run_sweep  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crops", type=int, default=200)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--templates", type=int, default=96)
    args = ap.parse_args()
    return emit(run_sweep(
        metric="lm_iters_sweep",
        config_overrides_by_cell={
            f"lm{n}": {"lm_iters": n} for n in (10, 6, 4, 2)
        },
        default_cell="lm10",
        crops=args.crops, seeds=args.seeds, templates=args.templates,
        # Cheapest admissible budget by NUMERIC value (cell keys are
        # strings; a bare min() would sort lexicographically).
        pick_rule=lambda cells: min(cells, key=lambda c: int(c[2:])),
    ))


if __name__ == "__main__":
    sys.exit(main())
