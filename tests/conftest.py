"""Test configuration: force an 8-device virtual CPU mesh.

Note: this environment pre-imports jax at interpreter startup and pins
``JAX_PLATFORMS=axon`` (the real TPU tunnel), so plain env vars are not
enough — we must override via ``jax.config`` before the backend initializes.
``XLA_FLAGS`` is still read lazily at backend init, so setting it here works
as long as no array op has run yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert len(jax.devices()) == 8, (
    "tests require the 8-device virtual CPU mesh; got " + str(jax.devices())
)


@pytest.fixture(scope="session")
def synthetic_file(tmp_path_factory):
    from dune_transformercvn_tpu.data.schema import make_synthetic_file

    path = tmp_path_factory.mktemp("data") / "synthetic.h5"
    make_synthetic_file(str(path), num_events=96, seed=7)
    return str(path)
