"""Chain-count saturation sweep on the current device.

Measures aggregate PMMH samples/s on the stochastic-SIR benchmark across
chain counts. On ONE chip this is a SATURATION curve, not weak scaling:
grid programs serialize on the single TensorCore, so aggregate throughput
rises toward a plateau as chains fill the grid while per-chain throughput
falls correspondingly (round-4 measurement at the 64-step default with
merge selection, 256-chain block cap: 356.1k/444.3k/483.8k/493.9k
samples/s at 256/1024/4096/8192 chains). Weak scaling across DEVICES is
the chains-mesh axis (parallel/mesh.py; dryrun_multichip) — per-chain
throughput is restored by sharding chains over chips. Prints one JSON
line per configuration.

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
    # 64 steps/call amortizes the ~25 ms tunnel dispatch (bench.py note);
    # at 16 steps the overhead inflates small-chain-count measurements.
    ap.add_argument("--steps", type=int, default=64)
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
            "per_chain_vs_smallest": round(per_chain / base_per_chain, 3),
        }))


if __name__ == "__main__":
    main()
