"""Render the fixed golden scene for tests/test_render_image.py.

The scene exercises every shading path at once: plasticine blob (SDF march +
trilinear color), a rigid sphere (sphere trace), ground + background planes,
the goal-density ghost (blinking even samples), directional-light shadows,
and the vignette/exposure tone map. 64x64, 8 spp, fixed PRNG.

`--write` regenerates the committed .npy (uint8) + a PNG for eyeballing.
Regenerate ONLY for an intentional image change, on the CPU backend
(JAX_PLATFORMS=cpu), and say why in the commit message.
"""
import os
import struct
import sys
import zlib

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if HERE not in sys.path:
    sys.path.insert(0, HERE)

GOLDEN_PATH = os.path.join(HERE, "tests", "assets", "golden_frame.npy")


def render_scene() -> np.ndarray:
    """Deterministic 64x64x3 uint8 frame of the fixed scene."""
    from plasticinelab_tpu.config.spec import (
        PrimitiveSpec, RendererSpec, SceneSpec, SimulatorSpec,
    )
    from plasticinelab_tpu.engine.renderer import Renderer

    ren = RendererSpec(
        spp=8, image_res=(64, 64), voxel_res=(64, 64, 64),
        target_res=(32, 32, 32), use_directional_light=True,
        light_direction=(0.3, 1.0, 0.2),
    )
    prim = PrimitiveSpec(shape="Sphere", radius=0.07,
                         init_pos=(0.62, 0.12, 0.5), color=(0.8, 0.6, 0.2),
                         action_dim=3, action_scale=(0.01,) * 3)
    scene = SceneSpec(
        simulator=SimulatorSpec(quality=0.25, n_particles=343),
        primitives=(prim,), renderer=ren,
    )
    r = Renderer(scene)

    g = np.linspace(0.33, 0.45, 7)
    x = np.stack(np.meshgrid(g, g - 0.25, g, indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(np.float32)
    colors = np.full(len(x), (76 << 16) + (102 << 8) + 179, np.int32)
    prim_pos = np.array([[0.62, 0.12, 0.5]], np.float32)
    prim_rot = np.array([[1.0, 0, 0, 0]], np.float32)
    prim_gap = np.zeros(1, np.float32)

    G = 32
    target = np.zeros((G, G, G))
    target[20:26, 2:8, 13:19] = 8.0
    r.set_target_density(target)

    img = r.render_frame(x, colors, prim_pos, prim_rot, prim_gap, spp=8,
                         target=1)
    return np.uint8(np.clip(img, 0, 1) * 255)


def write_png(path: str, img: np.ndarray):
    """Minimal RGB8 PNG writer (no external deps)."""
    h, w = img.shape[:2]
    raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 9))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


if __name__ == "__main__":
    img = render_scene()
    if "--write" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.save(GOLDEN_PATH, img)
        write_png(GOLDEN_PATH.replace(".npy", ".png"), img)
        print(f"wrote {GOLDEN_PATH} (+ .png), "
              f"mean={img.mean():.1f} max={img.max()}")
    else:
        golden = np.load(GOLDEN_PATH)
        mse = np.mean((img.astype(np.float64) - golden) ** 2)
        print(f"PSNR vs golden: {10*np.log10(255.0**2/max(mse,1e-12)):.2f} dB")
