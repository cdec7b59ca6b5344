"""Build a state_vec_drive-style artifact JSON from a (possibly truncated)
per-episode JSONL drive log — drives killed by a wall-clock timeout stream
rows but never reach the writer at the end of benchmarks/state_vec_drive.py.

Usage: python tools/eplog_to_artifact.py eplog.jsonl out.json metric_name unit
"""
import json
import sys


def main(eplog, out_path, metric, unit):
    rows = [json.loads(l) for l in open(eplog) if l.strip()]
    evals = [{"steps": r["steps"], "eval_return": r["eval_return"],
              "eval_incremental_iou": r["eval_incremental_iou"]}
             for r in rows if "eval_return" in r]
    rew = [r["mean_step_reward"] for r in rows]
    iou = [r["mean_final_incremental_iou"] for r in rows]
    k = max(len(rows) // 4, 1)
    ek = max(len(evals) // 4, 1)
    steps = rows[-1]["steps"] if rows else 0
    wall = rows[-1]["wall_s"] if rows else 0.0
    out = {
        "metric": metric,
        "value": round(steps / wall, 3) if wall else None,
        "unit": unit,
        "vs_baseline": None,
        "extra": {
            "num_steps": steps,
            "wallclock_s": wall,
            "truncated_by_wallclock": True,
            "episode_batches": len(rows),
            "mean_reward_first_quarter": round(sum(rew[:k]) / k, 4),
            "mean_reward_last_quarter": round(sum(rew[-k:]) / k, 4),
            "explore_incremental_iou_first_quarter": round(
                sum(iou[:k]) / k, 5),
            "explore_incremental_iou_last_quarter": round(
                sum(iou[-k:]) / k, 5),
            "evals": evals,
            "eval_iou_first_quarter": round(sum(
                e["eval_incremental_iou"] for e in evals[:ek]) / ek, 5)
            if evals else None,
            "eval_iou_last_quarter": round(sum(
                e["eval_incremental_iou"] for e in evals[-ek:]) / ek, 5)
            if evals else None,
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("metric", "value", "unit")}))


if __name__ == "__main__":
    main(*sys.argv[1:5])
