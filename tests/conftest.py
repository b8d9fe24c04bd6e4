"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
logic runs without TPU hardware (SURVEY.md section 4).

Note: the environment pre-imports jax with JAX_PLATFORMS=axon (one real
TPU), so env vars are too late here — use jax.config.update, which works
as long as no backend has been initialized yet.
"""

import os

import jax

if not os.environ.get("HALA_TEST_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_scene():
    from hala_tpu.scene.procedural import cornell_box

    return cornell_box()


@pytest.fixture(scope="session")
def cornell_device_scene(cornell_scene):
    from hala_tpu.scene.loader.uploader import SceneUploader

    return SceneUploader.upload(cornell_scene, use_ray_tracing=True)


@pytest.fixture()
def rs():
    return np.random.RandomState(42)
