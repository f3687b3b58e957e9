"""Test configuration: force an 8-device virtual CPU mesh before JAX init."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_file(tmp_path_factory):
    from dune_transformercvn_tpu.data.schema import make_synthetic_file

    path = tmp_path_factory.mktemp("data") / "synthetic.h5"
    make_synthetic_file(str(path), num_events=96, seed=7)
    return str(path)
