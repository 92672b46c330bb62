"""Test config: force CPU with 8 virtual devices (sharding tests run on a
virtual mesh; SURVEY.md section 4).

Note: the environment pins JAX_PLATFORMS=axon via sitecustomize and re-sets
the env var at interpreter start, so the only reliable override is
``jax.config.update`` after import, before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")
HW1_INPUTS = REFERENCE / "archive" / "hw1_inputs"
HW1_OUTPUTS = REFERENCE / "archive" / "hw1_outputs"


@pytest.fixture(scope="session")
def simple_scene():
    from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene

    return load_scene(str(HW1_INPUTS / "simple.xml"))


@pytest.fixture(scope="session")
def simple_pack(simple_scene):
    from advanced_cpu_raytracing_tpu.scene.pack import pack_scene

    return pack_scene(simple_scene)


def golden_image(name: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(HW1_OUTPUTS / f"{name}.png").convert("RGB"))
