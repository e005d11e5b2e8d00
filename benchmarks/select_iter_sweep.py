"""AR-gated two-phase-solve sweep on the cross-parity world.

Sweeps `pnp_select_iter` (the cheap per-template selection budget of the
two-phase solve; 0 = single-pass) at the shipped 200-hypothesis final
budget. Selection is by pre-refinement inlier count (reference
pnp_util.py:77-79), so the only thing the cheap pass can change is WHICH
template wins — the winner still gets the full budget, and the better of
the two passes is kept (inference.full_budget_winner). Measured round-5
verdict: select=100 is AR-POSITIVE (+1-1.5 pt vs single-pass, within 1 pt
of the oracle on both seeds) at neutral end-to-end device cost — the
admissible pick (artifact benchmarks/results/select_iter_sweep_r05.json,
trade notes docs/KERNELS.md §5).

Usage: python benchmarks/select_iter_sweep.py [--crops 200] [--seeds 2]
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
        metric="select_iter_sweep",
        config_overrides_by_cell={
            f"select{n}": {"pnp_select_iter": n} for n in (0, 100, 50, 25)
        },
        default_cell="select0",
        crops=args.crops, seeds=args.seeds, templates=args.templates,
        # Cheapest admissible NONZERO selection budget by NUMERIC value
        # (select0 = the single-pass default, not a two-phase pick; cell
        # keys are strings, so a bare min() would sort lexicographically).
        pick_rule=lambda cells: min(
            (c for c in cells if c != "select0"),
            key=lambda c: int(c[6:]), default="select0",
        ),
    ))


if __name__ == "__main__":
    sys.exit(main())
