"""Export tests: StableHLO round-trip parity with the jitted model."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.export import (
    VARIANTS,
    _fold_event_probs,
    _normalize_buckets,
    build_inference_fn,
    export_model,
    load_exported,
    select_bucket,
)
from dune_transformercvn_tpu.models import ModelConfig, TransformerCVN


def test_fold_event_probs():
    probs = jnp.asarray(np.arange(10, dtype=np.float32) / 45.0)
    folded = np.asarray(_fold_event_probs(probs, 10))
    np.testing.assert_allclose(
        folded, [(0 + 1 + 2 + 3) / 45, (4 + 5 + 6 + 7) / 45, 8 / 45, 9 / 45]
    )
    # 4-class output passes through untouched
    p4 = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    np.testing.assert_allclose(np.asarray(_fold_event_probs(p4, 4)), np.asarray(p4))


@pytest.fixture(scope="module")
def tiny_export_model():
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

    rng = np.random.default_rng(0)
    pixels = (rng.uniform(size=(21, 3, 64, 48)) < 0.02).astype(np.float32) * 128
    pixels = jnp.asarray(pixels)
    norm = {
        "mean": jnp.zeros(5), "std": jnp.ones(5),
        "extra_mean": jnp.asarray(0.0), "extra_std": jnp.asarray(1.0),
    }
    fn = build_inference_fn(model, "combined")
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


def test_inference_fn_outputs(tiny_export_model):
    model, variables, norm, pixels = tiny_export_model
    for variant, sizes in (("pid", 2), ("embeddings", 2), ("combined", 4)):
        fn = build_inference_fn(model, variant)
        out = jax.jit(fn)(variables, norm, pixels, jnp.asarray(5, jnp.int32))
        assert len(out) == sizes
    fn = build_inference_fn(model, "combined")
    ev_p, pr_p, ev_h, pr_h = jax.jit(fn)(
        variables, norm, pixels, jnp.asarray(5, jnp.int32)
    )
    assert ev_p.shape == (4,)          # 10 -> 4 folded
    np.testing.assert_allclose(float(ev_p.sum()), 1.0, rtol=1e-5)
    assert pr_p.shape == (20, 8)
    assert ev_h.shape == (32,) and pr_h.shape == (20, 32)


def test_num_prongs_masks_padding(tiny_export_model):
    """Garbage in the padded prong rows must not change the outputs."""
    model, variables, norm, pixels = tiny_export_model
    fn = jax.jit(build_inference_fn(model, "pid"))
    n = jnp.asarray(4, jnp.int32)
    ev0, pr0 = fn(variables, norm, pixels, n)
    poisoned = pixels.at[1 + 4:].set(255.0)  # rows past num_prongs
    ev1, pr1 = fn(variables, norm, poisoned, n)
    np.testing.assert_allclose(np.asarray(ev0), np.asarray(ev1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pr0[:4]), np.asarray(pr1[:4]), atol=1e-5)


def test_export_round_trip(tiny_export_model, tmp_path):
    model, variables, norm, pixels = tiny_export_model
    paths = export_model(model, variables, norm, str(tmp_path), prefix="tiny")
    assert set(paths) == set(VARIANTS)
    assert os.path.exists(str(tmp_path / "tiny_export_meta.json"))

    n = jnp.asarray(7, jnp.int32)
    direct = jax.jit(build_inference_fn(model, "pid"))(variables, norm, pixels, n)
    loaded = load_exported(paths["pid"])
    restored = loaded(pixels, n)
    for a, b in zip(direct, restored):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bucket_selection_rules():
    assert _normalize_buckets((4, 8, 12), 20) == (4, 8, 12, 20)
    assert _normalize_buckets((8, 4, 8, 50), 20) == (4, 8, 20)  # clip + dedup
    assert _normalize_buckets(None, 20) == (20,)
    assert _normalize_buckets((4, 8), 8) == (4, 8)
    assert select_bucket((4, 8, 20), 0) == 4
    assert select_bucket((4, 8, 20), 4) == 4
    assert select_bucket((4, 8, 20), 5) == 8
    assert select_bucket((4, 8, 20), 20) == 20
    assert select_bucket((4, 8), 13) == 8  # over-full event: largest bucket


def test_select_bucket_cost_aware():
    """Rung cost is NOT monotone in capacity: XLA's conv-strategy choice
    flips between compilations of nearby shapes
    (artifacts/export_buckets_v5e.json: P=8 measured 1.43 ms/event in
    round 4 but 2.6 ms at round-5 HEAD, while P=4 reproduced at 1.55).
    With measured per-rung costs in the export meta, dispatch picks the
    cheapest eligible rung."""
    head = {4: 1.55, 8: 2.62, 12: 3.92, 20: 5.07}       # round-5 HEAD
    assert select_bucket((4, 8, 12, 20), 3, head) == 4
    assert select_bucket((4, 8, 12, 20), 6, head) == 8
    r4 = {4: 1.55, 8: 1.43, 12: 2.9, 20: 5.05}          # round-4 strategy
    assert select_bucket((4, 8, 12, 20), 3, r4) == 8     # skip the bad rung
    assert select_bucket((4, 8, 12, 20), 9, r4) == 12
    # ties break to the smaller capacity
    assert select_bucket((4, 8), 2, {4: 1.0, 8: 1.0}) == 4
    # a missing cost on ANY eligible rung falls back to smallest-capacity
    assert select_bucket((4, 8, 12), 3, {8: 1.0}) == 4
    assert select_bucket((4, 8, 12), 3, None) == 4
    # over-full events still land on the largest bucket
    assert select_bucket((4, 8), 13, head) == 8


def test_default_ladder_keeps_the_small_rung():
    """The round-4 condemnation of P=4 (1.55 > P=8's 1.43) REVERSED at
    round-5 HEAD (P=8 recompiled to 2.6 ms; P=4 stable) — the ladder
    keeps the small rung and robustness comes from cost-aware dispatch,
    not from deleting rungs on one compilation's numbers."""
    from dune_transformercvn_tpu.export import DEFAULT_PRONG_BUCKETS

    assert min(DEFAULT_PRONG_BUCKETS) == 4
    assert select_bucket(_normalize_buckets(DEFAULT_PRONG_BUCKETS, 20), 3) == 4


def test_cpp_loader_selection_mirrors_select_bucket(tmp_path):
    """native/pjrt_loader.cc's bucket dispatch (which runs BEFORE the
    plugin loads, so no device is needed) must mirror select_bucket: the
    binary prints its choice to stderr, then fails on the bogus plugin."""
    import subprocess

    native = os.path.join(os.path.dirname(__file__), "..", "native")
    subprocess.run(["make", "-C", native, "pjrt_loader"], check=True,
                   capture_output=True)
    loader = os.path.join(native, "pjrt_loader")

    def choice(meta: dict, num_prongs: int) -> str:
        meta_path = tmp_path / "meta.json"
        meta_path.write_text(json.dumps(meta))
        result = subprocess.run(
            [loader, "/nonexistent_plugin.so", str(tmp_path / "tiny_pid"),
             str(meta_path), "/nonexistent_pixels.bin", str(num_prongs),
             str(tmp_path / "out.bin")],
            capture_output=True, text=True, timeout=60)
        assert result.returncode != 0  # dlopen of the bogus plugin fails
        line = [l for l in result.stderr.splitlines() if "-> bucket" in l]
        assert line, f"no selection line in stderr: {result.stderr!r}"
        return line[0]

    base = {"input_shape": [21, 3, 8, 8], "prong_buckets": [4, 8, 12, 20]}
    assert "bucket 4 " in choice(base, 3)  # no costs: smallest eligible
    assert "bucket 8 " in choice(base, 5)
    with_costs = dict(base, bucket_ms={"4": 1.55, "8": 1.43, "12": 2.9,
                                       "20": 5.05})
    assert "bucket 8 [cost-aware 1.430 ms]" in choice(with_costs, 3)
    assert "bucket 12 [cost-aware" in choice(with_costs, 9)
    # a cost missing on an eligible rung disables cost-aware dispatch
    partial = dict(base, bucket_ms={"8": 1.43, "12": 2.9, "20": 5.05})
    assert "bucket 4 " in choice(partial, 3)
    # over-full event: the full-capacity (unsuffixed) graph
    assert "bucket 20 " in choice(base, 20)


def test_bucketed_export_matches_full_graph(tiny_export_model, tmp_path):
    """A small-capacity bucket graph must reproduce the full graph's
    outputs for events that fit it (same checkpoint, fewer CNN passes —
    the serving-cost ladder, CreateCompiled.ipynb cell 6 dynamic Npng)."""
    model, variables, norm, pixels = tiny_export_model
    paths = export_model(
        model, variables, norm, str(tmp_path), prefix="tiny",
        prong_buckets=(4, 8),
    )
    assert set(paths) == {v + s for v in VARIANTS for s in ("", "_p4", "_p8")}

    import json
    with open(tmp_path / "tiny_export_meta.json") as f:
        meta = json.load(f)
    assert meta["prong_buckets"] == [4, 8, 20]
    assert meta["bucket_files"]["pid"]["4"] == "tiny_pid_p4.stablehlo"
    assert meta["bucket_files"]["pid"]["20"] == "tiny_pid.stablehlo"

    n = jnp.asarray(3, jnp.int32)
    full = load_exported(paths["combined"])(pixels, n)
    p4 = load_exported(paths["combined_p4"])(pixels[:5], n)
    # event probs + hidden identical; prong outputs match on the real rows
    np.testing.assert_allclose(np.asarray(full[0]), np.asarray(p4[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(full[2]), np.asarray(p4[2]), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(full[1][:3]), np.asarray(p4[1][:3]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(full[3][:3]), np.asarray(p4[3][:3]), atol=2e-4)
