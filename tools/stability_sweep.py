"""Stability sweep: every task family, 50 random env steps at |a| <= AMP.

VERDICT round-2 criterion: all 10 families survive >= 50 random steps at
|a| <= 1.0 in float32 (the reference's own NaN dump-and-raise guard stays
in place, plb/envs/env.py:50-56 semantics). Run on the TPU:

    python tools/stability_sweep.py [amp] [steps]
"""
import sys
import time

import numpy as np

FAMILIES = [
    "Move-v1", "Torus-v1", "Rope-v1", "Writer-v1", "Pinch-v1",
    "Rollingpin-v1", "Chopsticks-v1", "Table-v1", "TripleMove-v1",
    "Assembly-v1",
]


def main():
    amp = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    from plasticinelab_tpu.envs import make

    rng = np.random.default_rng(0)
    failures = []
    for name in FAMILIES:
        t0 = time.time()
        env = make(name)
        env.reset()
        status = f"OK ({steps} steps)"
        for t in range(steps):
            a = rng.uniform(-amp, amp, env.action_space.shape)
            try:
                obs, r, term, trunc, info = env.step(a)
            except Exception as e:
                status = f"FAIL at step {t}: {type(e).__name__}"
                failures.append(name)
                break
        print(f"{name:15s} {status}  [{time.time()-t0:.0f}s]", flush=True)
    print("FAILURES:", failures if failures else "none", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
