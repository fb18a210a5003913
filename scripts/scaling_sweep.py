"""Chain-count scaling sweep on the current device.

Measures aggregate PMMH samples/s on the stochastic-SIR benchmark across
chain counts (weak scaling of the embarrassingly parallel axis on one
chip; on a multi-chip mesh the same sweep exercises ICI scaling). Prints
one JSON line per configuration.

Run: python scripts/scaling_sweep.py [--chains 256 1024 4096] [--particles 128]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import _enable_compile_cache, tpu_samples_per_sec  # noqa: E402
from bayesssm_tpu.models.sir import simulate_sir  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, nargs="+",
                    default=[256, 1024, 4096, 8192])
    ap.add_argument("--particles", type=int, default=128)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--calls", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--transition", default="sir_sweep")
    args = ap.parse_args()

    _enable_compile_cache()
    _, y = simulate_sir(seed=1405)
    base_per_chain = None
    for c in args.chains:
        sps, _ = tpu_samples_per_sec(
            y, c, args.particles, args.steps, args.calls, args.reps,
            args.transition,
        )
        per_chain = sps / c
        if base_per_chain is None:
            base_per_chain = per_chain
        print(json.dumps({
            "chains": c,
            "samples_per_sec": round(sps, 2),
            "per_chain": round(per_chain, 4),
            "efficiency_vs_smallest": round(per_chain / base_per_chain, 3),
        }))


if __name__ == "__main__":
    main()
