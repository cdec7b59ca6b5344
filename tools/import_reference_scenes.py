"""One-time importer: reference task YAMLs -> resolved per-variant JSON specs.

Reads the 10 task configs from the reference benchmark, applies the VARIANTS
overlay for each of the 5 versions (the same merge semantics our runtime
loader implements), and writes fully-resolved scene dicts to
plasticinelab_tpu/envs/specs/<task>-v<N>.json. Also copies the goal density
grids (benchmark data assets) into plasticinelab_tpu/envs/assets/.

Run:  python tools/import_reference_scenes.py [reference_envs_dir]
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from plasticinelab_tpu.config.loader import load_scene_dict, resolve_variant, scene_from_dict

TASKS = [
    "move", "torus", "rope", "writer", "pinch", "rollingpin", "chopsticks",
    "table", "triplemove", "assembly",
]


def main(ref_envs="/root/reference/plb/envs"):
    out_specs = os.path.join(os.path.dirname(__file__), "..", "plasticinelab_tpu", "envs", "specs")
    out_assets = os.path.join(os.path.dirname(__file__), "..", "plasticinelab_tpu", "envs", "assets")
    os.makedirs(out_specs, exist_ok=True)
    os.makedirs(out_assets, exist_ok=True)

    for task in TASKS:
        cfg = load_scene_dict(os.path.join(ref_envs, f"{task}.yml"))
        n_var = max(len(cfg.get("VARIANTS") or []), 1)
        for version in range(1, n_var + 1):
            resolved = resolve_variant(cfg, version)
            # asset paths become plain basenames, resolved against envs/assets
            tp = resolved["ENV"]["loss"].get("target_path", "")
            if tp:
                base = os.path.basename(tp)
                resolved["ENV"]["loss"]["target_path"] = base
                src = os.path.join(ref_envs, "assets", base)
                dst = os.path.join(out_assets, base)
                if os.path.exists(src) and not os.path.exists(dst):
                    shutil.copyfile(src, dst)
            # validate it builds a SceneSpec
            scene_from_dict(resolved)
            out = os.path.join(out_specs, f"{task}-v{version}.json")
            with open(out, "w") as f:
                json.dump(resolved, f, indent=1, sort_keys=True)
            print("wrote", out)


if __name__ == "__main__":
    main(*sys.argv[1:])
