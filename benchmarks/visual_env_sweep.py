"""Visual-observation sweep across all 10 benchmark task families
(BASELINE configs[3]: rendered 64x64 observations on all 10 envs).

For each family: build the rgb-obs env, reset, drive a few random steps,
and record the rendered-observation health (shape, non-empty frames) and
per-step wallclock. The RL learners are task-agnostic (the same conv
agents consume any env's frames — tests/test_vec_learners.py,
tests/test_visual_obs.py); this sweep pins the render+step pipeline on
every scene family on the chip. Writes one JSON document.

Usage: python benchmarks/visual_env_sweep.py [out.json] [steps_per_env]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TASKS = ["Move-v1", "Torus-v1", "Rope-v1", "Writer-v1", "Pinch-v1",
         "Rollingpin-v1", "Chopsticks-v1", "Table-v1", "TripleMove-v1",
         "Assembly-v1"]


def main(out_path="VISUAL_SWEEP_r03.json", steps=4):
    from plasticinelab_tpu.envs import make

    rows = []
    rng = np.random.default_rng(0)
    for task in TASKS:
        t_build = time.perf_counter()
        try:
            env = make(task, obs_mode="rgb", image_obs_res=64,
                       image_obs_spp=2)
            obs, _ = env.reset()
            step_times = []
            nonzero = int((np.asarray(obs) > 0).sum())
            ok = obs.shape == (64, 64, 3) and obs.dtype == np.uint8
            for i in range(int(steps)):
                a = rng.uniform(-0.5, 0.5,
                                env.action_space.shape).astype(np.float32)
                t0 = time.perf_counter()
                obs, r, term, trunc, info = env.step(a)
                step_times.append(time.perf_counter() - t0)
                ok = ok and np.isfinite(float(r)) \
                    and obs.shape == (64, 64, 3)
                nonzero = min(nonzero, int((np.asarray(obs) > 0).sum()))
            rows.append({
                "task": task, "status": "OK" if ok and nonzero > 0
                else "BAD",
                "steady_step_s": round(min(step_times), 4),
                "first_step_s": round(step_times[0], 2),
                "build_reset_s": round(time.perf_counter() - t_build, 1),
                "min_nonzero_px": nonzero,
            })
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            rows.append({"task": task, "status": "FAIL",
                         "error": f"{type(e).__name__}: {e}"[:300]})
        print(rows[-1], flush=True)
    doc = {
        "metric": "visual_obs_env_sweep",
        "description": "rgb 64x64x2spp observation pipeline (jitted "
                       "in-graph voxelize+march) driven on every benchmark "
                       "task family on the chip; steady_step_s = physics "
                       "env step + observation render, host-driven "
                       "single env.",
        "tasks": rows,
        "failures": [r["task"] for r in rows if r["status"] != "OK"],
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "visual_obs_env_sweep",
                      "ok": len(doc["failures"]) == 0,
                      "tasks": len(rows)}))


if __name__ == "__main__":
    main(*sys.argv[1:])
