"""Full-network golden parity against the ACTUAL reference implementation.

Runs the reference's live dense network (NeutrinoDenseNetwork) on torch CPU —
with MinkowskiEngine stubbed out, since only the sparse path touches it —
transplants its weights into our Flax TransformerCVN, feeds both the same
batch through their respective pipelines, and asserts the event and prong
logits agree.  This is the strongest form of the SURVEY §4 golden-value
parity requirement: the whole model, end to end.

Skipped automatically when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "transformercvn")),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.data import Batcher, EventDataset
from dune_transformercvn_tpu.data.schema import make_synthetic_file
from dune_transformercvn_tpu.models import ModelConfig, TransformerCVN


def _import_reference_network():
    if "MinkowskiEngine" not in sys.modules:
        stub = types.ModuleType("MinkowskiEngine")
        stub.SparseTensor = type("SparseTensor", (), {})
        stub.cat = lambda *a: None
        sys.modules["MinkowskiEngine"] = stub
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from transformercvn.network.networks.neutrino_full_dense_network import (
        NeutrinoDenseNetwork,
    )
    from transformercvn.options import Options as RefOptions

    return NeutrinoDenseNetwork, RefOptions


# The transplant mapping lives in the package now (it powers the reference
# checkpoint importer, dune_transformercvn_tpu/torch_import.py); these tests
# drive the SAME functions against the live reference network, so the
# importer's weight mapping carries this golden coverage.  Re-exported here
# because the other golden tests (resnet/mobilenet) import them from this
# module.
from dune_transformercvn_tpu.torch_import import (  # noqa: F401
    conv_w,
    map_densenet,
    map_encoder_layer,
    set_bn,
    t2n,
    transplant_dense_network,
)


def reference_inputs(ds, B, log_pixels=False):
    """Replicate the reference trainer's host preprocessing on the first B
    dataset events: mask-normalized features, normalized extra, densified
    NCHW event/prong images with packed prong slots in row-major (event,
    position) order.  ``log_pixels`` applies the trainer's log(1+v) pixel
    scaling instead of v/255 (neutrino_full_dense_trainer.py:54-58).
    Reused by tests/test_torch_import.py."""
    raw = ds.gather_events(np.arange(B))
    mask = torch.from_numpy(raw["prong_mask"])
    features = torch.from_numpy(raw["features"]).clone()
    mean, std = torch.from_numpy(ds.mean), torch.from_numpy(ds.std)
    features[mask] = (features[mask] - mean) / std
    extra = (torch.from_numpy(raw["extra"]) - float(ds.extra_mean)) / float(ds.extra_std)
    event_mask = torch.ones(B, 1, dtype=torch.bool)

    H, W, C = 400, 280, 3

    def densify(coords_xy, values, owner, num_images):
        out = torch.zeros(num_images, H, W, C)
        idx = (torch.from_numpy(owner), torch.from_numpy(coords_xy[:, 0]),
               torch.from_numpy(coords_xy[:, 1]))
        v = torch.from_numpy(np.asarray(values, np.float32))
        v = torch.log1p(v) if log_pixels else v / 255.0
        out.index_put_(idx, v, accumulate=True)
        return out.permute(0, 3, 1, 2).contiguous()

    event_pixels = densify(raw["event_coords"][:, 1:], raw["event_values"],
                           raw["event_owner"], B)
    # packed prong images in row-major (event, position) order == slot order
    slot_of = {}
    cursor = 0
    for i in range(B):
        for p in range(int(mask[i].sum())):
            slot_of[(i, p)] = cursor
            cursor += 1
    owner_slots = np.array([
        slot_of[(int(o), int(p))]
        for o, p in zip(raw["prong_owner"], raw["prong_coords"][:, 0])
    ])
    prong_pixels = densify(raw["prong_coords"][:, 1:], raw["prong_values"],
                           owner_slots, cursor)
    return features, extra, event_pixels, event_mask, prong_pixels, mask


def _infer_layout(sd):
    """Re-derive the architecture the way the importer does, to pin its
    key-layout inference against the explicitly-configured reference net."""
    from dune_transformercvn_tpu.torch_import import _infer_densenet_blocks

    blocks = _infer_densenet_blocks(sd, "prong_embedding.event_pixel_embedding")
    hidden = int(sd["encoder.encoder.layers.0.self_attn.in_proj_weight"].shape[1])
    layers = sum(1 for k in sd if k.endswith("self_attn.in_proj_weight"))
    decoder_layers = sum(
        1 for k in sd
        if k.startswith("prong_decoder.hidden_layers.")
        and k.endswith(".weight") and int(k.split(".")[2]) % 3 == 0
    )
    return blocks, hidden, layers, decoder_layers


def _tiny_common(norm_first):
    return dict(
        hidden_dim=32, densenet_structure=[1, 1], densenet_growth_rate=8,
        densenet_batch_norm_size=4, initial_pixel_dim=8,
        pixel_embedding_dim=16, feature_embedding_dim=8,
        position_embedding_dim=8, num_encoder_layers=2,
        num_attention_heads=4, num_prong_decoder_layers=2,
        dropout=0.0, disable_smart_features=True,
        pixel_noise_std=0.0,  # our model applies noise in-graph at train time
        transformer_activation="gelu", transformer_norm_first=norm_first,
    )


@pytest.mark.parametrize("norm_first", [False, True])
def test_full_network_logits_match_reference(tmp_path, norm_first):
    _full_network_parity(tmp_path, _tiny_common(norm_first))


def test_full_network_parity_production_scale(tmp_path):
    """The same weight-transplant golden check at the PRODUCTION width
    (option_files/fdhd_beam_2018prod_2023_08_07.json: hidden 128, DenseNet
    [3,6,12,6,3] growth 32, 6 encoder layers, 4 prong-decoder layers) —
    pins fp32 agreement where deeper BN chains could drift (VERDICT r1
    item 6).  ~75 s on the 1-core CPU host.
    """
    common = dict(
        hidden_dim=128, densenet_structure=[3, 6, 12, 6, 3],
        densenet_growth_rate=32, densenet_batch_norm_size=4,
        initial_pixel_dim=64, pixel_embedding_dim=256,
        feature_embedding_dim=32, position_embedding_dim=32,
        num_encoder_layers=6, num_attention_heads=8,
        num_prong_decoder_layers=4,
        dropout=0.0, disable_smart_features=True, pixel_noise_std=0.0,
        transformer_activation="gelu", transformer_norm_first=False,
    )
    _full_network_parity(tmp_path, common, check_train_mode=False)


def _full_network_parity(tmp_path, common, check_train_mode=True):
    NeutrinoDenseNetwork, RefOptions = _import_reference_network()
    hidden = common["hidden_dim"]
    heads = common["num_attention_heads"]
    layers = common["num_encoder_layers"]
    blocks = common["densenet_structure"]

    ref_options = RefOptions()
    for key, value in common.items():
        setattr(ref_options, key, value)
    torch.manual_seed(0)
    ref_net = NeutrinoDenseNetwork(ref_options, 6, 4, 3, 8, 4).eval()
    with torch.no_grad():  # randomize BN running stats for a real eval test
        for module in ref_net.modules():
            if isinstance(module, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                module.running_mean.normal_(0, 0.2)
                module.running_var.uniform_(0.7, 1.4)

    # ---- our model --------------------------------------------------------
    options = Options()
    for key, value in common.items():
        setattr(options, key, value)
    options.compute_dtype = "float32"

    path = str(tmp_path / "parity.h5")
    make_synthetic_file(path, num_events=9, num_features=6, num_extra=4, seed=3)
    ds = EventDataset(path, event_current_targets=True)
    ds.compute_statistics()

    cfg = ModelConfig.from_options(
        options, ds.num_features, ds.num_extra, ds.pixel_features,
        ds.num_event_classes, ds.num_prong_classes,
    )
    model = TransformerCVN(cfg)
    B = 4
    batcher = Batcher(ds, batch_size=B, coo_granularity=512)
    batch = batcher.build_batch(np.arange(B))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    norm = {
        "mean": jnp.asarray(ds.mean), "std": jnp.asarray(ds.std),
        "extra_mean": jnp.asarray(ds.extra_mean), "extra_std": jnp.asarray(ds.extra_std),
    }
    variables = jax.jit(lambda b, n: model.init(jax.random.PRNGKey(0), b, n, train=False))(
        jbatch, norm
    )
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    # ---- transplant every reference weight (the importer's mapping) --------
    sd = ref_net.state_dict()
    transplant_dense_network(sd, params, stats, heads=heads)
    assert _infer_layout(sd) == (blocks, hidden, layers,
                                 common["num_prong_decoder_layers"])

    # ---- our forward -------------------------------------------------------
    ours_ev, ours_pr = jax.jit(
        lambda v, b, n: model.apply(v, b, n, train=False)
    )({"params": params, "batch_stats": stats}, jbatch, norm)

    # ---- reference forward (trainer preprocessing replicated inline) -------
    ref_inputs = reference_inputs(ds, B)
    with torch.no_grad():
        ref_ev, ref_pr = ref_net(*ref_inputs)
    raw = ds.gather_events(np.arange(B))

    np.testing.assert_allclose(
        np.asarray(ours_ev), t2n(ref_ev), rtol=2e-3, atol=2e-4
    )
    real = np.asarray(raw["prong_mask"])
    np.testing.assert_allclose(
        np.asarray(ours_pr)[real], t2n(ref_pr)[real], rtol=2e-3, atol=2e-4
    )

    if not check_train_mode:
        return
    # ---- train-mode parity: masked BN == the reference's packed BN ---------
    # (dropout/noise are 0; batch statistics are live). Event logits must
    # match exactly — every BN on the event path sees the same packed rows.
    # Prong logits are NOT compared: the reference's prong-decoder BN
    # includes padded zero rows (a documented batch-composition quirk our
    # masked decoder deliberately fixes, see models/heads.py).
    ref_net.train()
    with torch.no_grad():
        ref_ev_t, _ = ref_net(*ref_inputs)
    (ours_ev_t, _), _ = jax.jit(
        lambda v, b, n: model.apply(
            v, b, n, train=True,
            rngs={"dropout": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
    )({"params": params, "batch_stats": stats}, jbatch, norm)
    np.testing.assert_allclose(
        np.asarray(ours_ev_t), t2n(ref_ev_t), rtol=5e-3, atol=5e-4
    )


def test_split_target_derivation_matches_reference(tmp_path):
    """Golden check of the split-event-targets derivation: run the ACTUAL
    reference SplitNeutrinoDataset (split_dataset.py:6-30) on a legacy-schema
    file and compare its current/generation targets and validity mask with
    our in-graph split_event_targets."""
    import h5py

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from transformercvn.dataset.split_dataset import SplitNeutrinoDataset

    from dune_transformercvn_tpu.ops.losses import split_event_targets

    N, P, F, E = 41, 6, 4, 3
    rng = np.random.default_rng(0)
    targets = np.concatenate(
        [np.arange(10), rng.integers(0, 10, N - 10)]
    ).astype(np.int64)
    path = str(tmp_path / "legacy.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=rng.normal(size=(N, F, P)).astype(np.float32))
        f.create_dataset("mask", data=np.ones((N, P), np.bool_))
        f.create_dataset("extra", data=rng.normal(size=(N, E)).astype(np.float32))
        f.create_dataset("target", data=targets)

    ref = SplitNeutrinoDataset(path, limit_index=1.0)
    loaded = ref.targets.numpy()          # reference keeps [min,max) slice
    ours_current, ours_generation = jax.jit(split_event_targets)(
        jnp.asarray(loaded)
    )
    ours_current = np.asarray(ours_current)
    ours_generation = np.asarray(ours_generation)

    np.testing.assert_array_equal(ours_current, ref.current_target.numpy())
    valid = ref.generation_valid.numpy()
    np.testing.assert_array_equal(ours_generation >= 0, valid)
    np.testing.assert_array_equal(
        ours_generation[valid], ref.generation_target.numpy()[valid]
    )
