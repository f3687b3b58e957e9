"""C++ PJRT loader end-to-end test: the language-boundary proof.

The reference ships TorchScript artifacts that LArSoft's C++ ART module
loads and runs (CreateCompiled.ipynb cells 9-14, "Check to make sure the
traced models work").  The TPU-native replacement is a StableHLO portable
artifact executed through the PJRT C API by ``native/pjrt_loader.cc``.

This test builds the loader with ``make -C native pjrt_loader``, exports
a small fp32 model lowered for TPU, runs the ``pid`` graph through the
real PJRT plugin in a C++ subprocess, and checks the outputs against the
Python-side logits.  It needs the TPU tunnel plugin, so it is skipped on
hosts without one.
"""

import os
import struct
import subprocess
import uuid

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.export import build_inference_fn, export_model
from dune_transformercvn_tpu.models import ModelConfig, TransformerCVN

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")
AXON_PLUGIN = "/opt/axon/libaxon_pjrt.so"

def _tunnel_alive(timeout_s: float = 120.0) -> bool:
    """The plugin file existing does not mean the tunnel is up — outages
    hang inside C++ calls where no Python signal fires, so probe the
    device from a subprocess with a hard timeout."""
    import sys

    code = (
        "import jax, jax.numpy as jnp\n"
        "x = jnp.ones((8, 8), jnp.float32)\n"
        "print(float(jax.device_get((x @ x)[0, 0])))\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="axon")
    try:
        subprocess.run(
            [sys.executable, "-c", code], check=True, timeout=timeout_s,
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


pytestmark = pytest.mark.skipif(
    not os.path.exists(AXON_PLUGIN) or not _tunnel_alive(),
    reason="no live PJRT plugin on this host (TPU tunnel absent or down)",
)

# PJRT_Buffer_Type enum (pjrt_c_api.h): INVALID=0, PRED=1, S8..S64=2..5,
# U8..U64=6..9, F16=10, F32=11.
PJRT_TYPE_F32 = 11


def _build_loader():
    subprocess.run(
        ["make", "-C", NATIVE, "pjrt_loader"], check=True, capture_output=True
    )
    return os.path.join(NATIVE, "pjrt_loader")


def _axon_options(session_id):
    """PJRT_Client_Create options mirroring the sandbox's jax registration
    (axon.register.pjrt._register_backend)."""
    return [
        "topology=str:v5e:1x1x1",
        f"session_id=str:{session_id}",
        "remote_compile=int:1",
        "local_only=int:0",
        "priority=int:0",
        "n_slices=int:1",
        "rank=int:4294967295",
    ]


def _read_outputs(path):
    """Parse the loader's out.bin: u32 n, then per output u32 rank,
    i64 dims[rank], u32 pjrt dtype, raw data."""
    outs = []
    with open(path, "rb") as f:
        (n,) = struct.unpack("<I", f.read(4))
        for _ in range(n):
            (rank,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{rank}q", f.read(8 * rank)) if rank else ()
            (dtype,) = struct.unpack("<I", f.read(4))
            count = int(np.prod(dims)) if dims else 1
            data = np.frombuffer(f.read(4 * count), dtype=np.float32)
            outs.append((dims, dtype, data.reshape(dims)))
    return outs


@pytest.fixture(scope="module")
def tiny_fp32_model():
    o = Options()
    o.densenet_structure = [1]
    o.densenet_growth_rate = 8
    o.initial_pixel_dim = 8
    o.pixel_embedding_dim = 16
    o.feature_embedding_dim = 8
    o.position_embedding_dim = 8
    o.hidden_dim = 32
    o.num_encoder_layers = 1
    o.num_attention_heads = 4
    o.compute_dtype = "float32"
    cfg = ModelConfig.from_options(
        o, features_dim=5, extra_dim=3, pixel_channels=3,
        num_event_classes=10, num_prong_classes=8,
        image_shape=(64, 48),
    )
    model = TransformerCVN(cfg)

    rng = np.random.default_rng(7)
    pixels = (rng.uniform(size=(21, 3, 64, 48)) < 0.02).astype(np.float32) * 128
    pixels = jnp.asarray(pixels)
    norm = {
        "mean": jnp.zeros(5), "std": jnp.ones(5),
        "extra_mean": jnp.asarray(0.0), "extra_std": jnp.asarray(1.0),
    }
    variables = jax.jit(
        lambda p, n: model.init(
            jax.random.PRNGKey(0),
            jnp.transpose(p[:1], (0, 2, 3, 1)),
            jnp.transpose(p[1:], (0, 2, 3, 1)),
            jnp.zeros((1, 20, 5)), jnp.zeros((1, 3)),
            jnp.ones((1, 20), bool),
            jnp.zeros(20, jnp.int32), jnp.arange(20, dtype=jnp.int32),
            jnp.ones(20, bool), n, False,
            method=TransformerCVN.forward_from_images,
        )
    )(pixels, norm)
    return model, variables, norm, pixels


def test_pjrt_loader_matches_python(tiny_fp32_model, tmp_path):
    """Bucket-ladder C++ execution: the loader (variant-prefix mode) must
    pick the smallest exported capacity >= num_prongs and match the
    Python-side logits of that bucket's graph — num_prongs=3 dispatches to
    the p4 artifact, num_prongs=5 to the full-capacity one."""
    from dataclasses import replace

    from dune_transformercvn_tpu.models import TransformerCVN as TCVN

    model, variables, norm, pixels = tiny_fp32_model
    loader = _build_loader()

    # Export a two-rung ladder lowered for TPU with fp32 MXU passes baked
    # in, so the device run is bit-comparable to the CPU reference
    # numerics.
    p4_model = TCVN(replace(model.cfg, max_prongs=4))
    with jax.default_matmul_precision("highest"):
        paths = export_model(
            model, variables, norm, str(tmp_path), prefix="tiny",
            platforms=("tpu",), prong_buckets=(4,),
        )
        ref_p4 = jax.jit(build_inference_fn(p4_model, "pid"))(
            variables, norm, pixels[:5], jnp.asarray(3, jnp.int32)
        )
        ref_full = jax.jit(build_inference_fn(model, "pid"))(
            variables, norm, pixels, jnp.asarray(5, jnp.int32)
        )
    assert os.path.exists(paths["pid_p4"] + ".mlirbc")
    assert os.path.exists(paths["pid"] + ".mlirbc")
    meta = os.path.join(str(tmp_path), "tiny_export_meta.json")
    prefix = os.path.join(str(tmp_path), "tiny_pid")

    # One padded-to-max pixels file serves every bucket (the loader feeds
    # only the first 1+P rows to a bucketed graph).
    pixels_bin = os.path.join(str(tmp_path), "pixels.bin")
    np.asarray(pixels, np.float32).tofile(pixels_bin)

    env = dict(os.environ)
    env.update(
        AXON_COMPAT_VERSION=env.get("AXON_COMPAT_VERSION", "49"),
        PJRT_LIBRARY_PATH=AXON_PLUGIN,
        AXON_POOL_SVC_OVERRIDE="127.0.0.1",
        AXON_LOOPBACK_RELAY="1",
        TPU_WORKER_HOSTNAMES="localhost",
    )

    for num_prongs, expect_artifact, reference in (
        (3, "tiny_pid_p4.stablehlo.mlirbc", ref_p4),
        (5, "tiny_pid.stablehlo.mlirbc", ref_full),
    ):
        out_bin = os.path.join(str(tmp_path), f"out_{num_prongs}.bin")
        result = subprocess.run(
            [loader, AXON_PLUGIN, prefix, meta, pixels_bin,
             str(num_prongs), out_bin]
            + _axon_options(f"pjrt-loader-test-{uuid.uuid4()}"),
            env=env, capture_output=True, text=True, timeout=900,
        )
        assert result.returncode == 0, (
            f"pjrt_loader failed\nstdout: {result.stdout}\n"
            f"stderr: {result.stderr}"
        )
        assert f"({os.path.join(str(tmp_path), expect_artifact)})" in result.stderr, (
            f"wrong bucket for num_prongs={num_prongs}:\n{result.stderr}"
        )

        outputs = _read_outputs(out_bin)
        assert len(outputs) == len(reference)
        for i, ((dims, dtype, got), want) in enumerate(zip(outputs, reference)):
            want = np.asarray(want)
            assert dims == want.shape, f"output {i}: {dims} != {want.shape}"
            assert dtype == PJRT_TYPE_F32
            np.testing.assert_allclose(
                got, want, atol=5e-5, rtol=1e-4,
                err_msg=(
                    f"output {i} (num_prongs={num_prongs}) diverges "
                    "between C++ TPU and Python CPU"
                ),
            )
