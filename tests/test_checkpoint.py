"""Checkpoint/resume round-trip."""
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from plasticinelab_tpu.utils import checkpoint as ckpt


def test_save_load_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        payload = {"a": jnp.arange(5.0), "b": {"c": np.ones((2, 3))}, "n": 7}
        path = ckpt.save(os.path.join(d, "ckpt_3.pkl"), payload)
        out = ckpt.load(path)
        np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(5.0))
        np.testing.assert_array_equal(out["b"]["c"], np.ones((2, 3)))
        assert out["n"] == 7


def test_latest_selection():
    with tempfile.TemporaryDirectory() as d:
        for step in (1, 10, 2):
            ckpt.save(os.path.join(d, f"ckpt_{step}.pkl"), {"step": step})
        path = ckpt.latest(d)
        assert path.endswith("ckpt_10.pkl")
        assert ckpt.load(path)["step"] == 10
    assert ckpt.latest("/nonexistent/dir") is None
