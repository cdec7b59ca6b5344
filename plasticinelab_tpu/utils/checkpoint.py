"""Training checkpoint/resume — a capability the reference lacks entirely
(SURVEY.md §5: "no training-resume system"). Plain-pickle of PyTrees with
atomic rename; works for solver action sequences, optimizer moments, RL
agent states, and physics SimStates alike."""
from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any, Optional

import jax


def save(path: str, payload: Any) -> str:
    """Atomically write a checkpoint (device arrays are fetched to host)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host = jax.device_get(payload)
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load(path: str, device_put: bool = False) -> Any:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return jax.device_put(payload) if device_put else payload


def latest(directory: str, prefix: str = "ckpt_") -> Optional[str]:
    """Most recent checkpoint file `<prefix><step>.pkl` in a directory."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".pkl"):
            try:
                step = int(name[len(prefix):-4])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best
