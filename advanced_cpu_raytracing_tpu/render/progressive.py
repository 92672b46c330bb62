"""Progressive rendering with checkpoint/resume.

The reference has no checkpointing — a render is all-or-nothing per camera
(SURVEY.md section 5).  The TPU-native equivalent implemented here: samples
accumulate in a running (sum, weight) framebuffer that is periodically
offloaded to host and written as an .npz checkpoint; a later run resumes from
the last completed sample batch (keyed by sample index, so the RNG stream
continues exactly where it stopped).  Also enables progressive previews.
"""

from __future__ import annotations

import os

import numpy as np
import jax

from advanced_cpu_raytracing_tpu.render.camera import build_camera
from advanced_cpu_raytracing_tpu.render.integrator import trace_radiance
from advanced_cpu_raytracing_tpu.render.renderer import (
    DEFAULT_TILE,
    options_for_camera,
)

CKPT_VERSION = 1


class ProgressiveRenderer:
    """Accumulates spp one sample-pass at a time, checkpointable."""

    def __init__(self, pack, cfg, cam_cfg, seed: int = 0,
                 tile_size: int = DEFAULT_TILE):
        self.pack = pack
        self.cfg = cfg
        self.cam_cfg = cam_cfg
        self.cam = build_camera(cam_cfg)
        self.opts = options_for_camera(cfg, cam_cfg)
        self.seed = seed
        self.tile_size = tile_size
        w, h = cam_cfg.width, cam_cfg.height
        self.acc = np.zeros((h * w, 3), np.float64)
        self.samples_done = 0
        ys, xs = np.divmod(np.arange(h * w, dtype=np.int64), w)
        self._px = xs.astype(np.float32)
        self._py = ys.astype(np.float32)
        self._jit = jax.jit(
            lambda pack, cam, px, py, key: trace_radiance(
                pack, cam, px, py, key, self.opts
            )
        )

    def step(self) -> None:
        """Render one full-image sample pass and accumulate."""
        import jax.numpy as jnp

        s = self.samples_done
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), s)
        total = len(self._px)
        n_tiles = (total + self.tile_size - 1) // self.tile_size
        jitter = np.asarray(
            jax.random.uniform(jax.random.fold_in(key, 999), (total, 2))
        ) if s > 0 else np.full((total, 2), 0.0, np.float32)
        for ti in range(n_tiles):
            lo = ti * self.tile_size
            hi = min(lo + self.tile_size, total)
            pad = self.tile_size - (hi - lo)
            px = np.pad(self._px[lo:hi] + jitter[lo:hi, 0], (0, pad))
            py = np.pad(self._py[lo:hi] + jitter[lo:hi, 1], (0, pad))
            col = self._jit(self.pack, self.cam, jnp.asarray(px),
                            jnp.asarray(py), jax.random.fold_in(key, ti))
            self.acc[lo:hi] += np.asarray(col, np.float64)[: hi - lo]
        self.samples_done += 1

    @property
    def image(self) -> np.ndarray:
        h, w = self.cam_cfg.height, self.cam_cfg.width
        n = max(self.samples_done, 1)
        return (self.acc / n).reshape(h, w, 3).astype(np.float32)

    # ---- checkpointing ----

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        np.savez_compressed(
            tmp, version=CKPT_VERSION, acc=self.acc,
            samples_done=self.samples_done, seed=self.seed,
            width=self.cam_cfg.width, height=self.cam_cfg.height,
        )
        os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)

    def load(self, path: str) -> bool:
        if not os.path.exists(path):
            return False
        data = np.load(path)
        if int(data["version"]) != CKPT_VERSION:
            return False
        if (int(data["width"]) != self.cam_cfg.width
                or int(data["height"]) != self.cam_cfg.height
                or int(data["seed"]) != self.seed):
            return False
        self.acc = data["acc"]
        self.samples_done = int(data["samples_done"])
        return True

    def render(self, spp: int, checkpoint: str | None = None,
               checkpoint_every: int = 8) -> np.ndarray:
        if checkpoint:
            self.load(checkpoint)
        while self.samples_done < spp:
            self.step()
            if checkpoint and self.samples_done % checkpoint_every == 0:
                self.save(checkpoint)
        if checkpoint:
            self.save(checkpoint)
        return self.image
