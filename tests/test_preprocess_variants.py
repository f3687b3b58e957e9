"""Pixel-preprocessing variants (one-hot / log1p) and CLI surface checks."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_transformercvn_tpu.models.network import ModelConfig, TransformerCVN


def tiny_cfg(**overrides):
    base = dict(
        hidden_dim=16, initial_feature_dim=8, initial_pixel_dim=4,
        feature_embedding_dim=8, pixel_embedding_dim=8, position_embedding_dim=8,
        num_encoder_layers=1, num_prong_decoder_layers=1, num_attention_heads=2,
        densenet_structure=(1,), densenet_growth_rate=4, densenet_batch_norm_size=2,
        dropout=0.0, features_dim=3, extra_dim=2, pixel_channels=3,
        image_height=32, image_width=24, num_event_classes=4, num_prong_classes=8,
        compute_dtype="float32",
    )
    base.update(overrides)
    return ModelConfig(**base)


def tiny_batch(rng, B=2, P=4, NE=32, NP=48, cfg=None):
    H, W = cfg.image_height, cfg.image_width
    def coo(n, owners_max):
        return (
            jnp.asarray(np.stack([rng.integers(0, H, n), rng.integers(0, W, n)], 1), jnp.int32),
            jnp.asarray(rng.integers(1, 255, (n, 3)).astype(np.float32)),
            jnp.asarray(rng.integers(0, owners_max, n), jnp.int32),
        )
    ev_xy, ev_vals, ev_owner = coo(NE, B)
    pr_xy, pr_vals, pr_owner = coo(NP, P)
    return {
        "features": jnp.asarray(rng.normal(size=(B, 20, 3)).astype(np.float32)),
        "extra": jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32)),
        "prong_mask": jnp.asarray(np.arange(20)[None] < 2).repeat(B, 0),
        "event_targets": jnp.asarray(rng.integers(0, 4, B), jnp.int32),
        "prong_targets": jnp.asarray(np.where(np.arange(20)[None] < 2, 1, -1)).repeat(B, 0).astype(jnp.int32),
        "event_xy": ev_xy, "event_vals": ev_vals, "event_owner": ev_owner,
        "prong_xy": pr_xy, "prong_vals": pr_vals, "prong_owner": pr_owner,
        "slot_batch": jnp.asarray([0, 0, 1, 1], jnp.int32),
        "slot_pos": jnp.asarray([0, 1, 0, 1], jnp.int32),
        "slot_mask": jnp.ones(P, bool),
    }


NORM = {
    "mean": jnp.zeros(3), "std": jnp.ones(3),
    "extra_mean": jnp.asarray(0.0), "extra_std": jnp.asarray(1.0),
}


@pytest.mark.parametrize("variant", ["one_hot", "log"])
def test_pixel_preprocessing_variants_forward(variant):
    cfg = tiny_cfg(one_hot_pixels=variant == "one_hot", log_pixels=variant == "log")
    model = TransformerCVN(cfg)
    rng = np.random.default_rng(0)
    batch = tiny_batch(rng, cfg=cfg)
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, NORM, train=False))(batch)
    ev, pr = jax.jit(lambda v, b: model.apply(v, b, NORM, train=False))(variables, batch)
    assert ev.shape == (2, 4) and pr.shape == (2, 20, 8)
    assert np.isfinite(np.asarray(ev)).all()
    if variant == "one_hot":
        # stem conv consumes 256 * C channels
        stem = variables["params"]["event_pixel_embedding"]["Conv_0"]["kernel"]
        assert stem.shape[2] == 256 * 3


def test_cli_help_exposes_flags():
    out = subprocess.run(
        [sys.executable, "train.py", "--help"], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0
    for flag in ("--sparse", "--sdxl", "--embedder", "-fp16", "--auto_resume",
                 "--profile", "--debug_nans", "--max_steps", "--graph"):
        assert flag in out.stdout, flag


def test_cli_missing_training_file_message():
    out = subprocess.run(
        [sys.executable, "train.py", "-n", "x"], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode != 0
    assert "No training file configured" in out.stderr + out.stdout
