"""Tests for the reference checkpoint importer (torch_import.py).

Builds the ACTUAL reference network, saves it as a Lightning-style .ckpt
(``network.``-prefixed state_dict + the frozen normalization parameters of
neutrino_base.py:37-45 + ``global_step``), imports it into a run directory,
restores through the same CheckpointManager flow evaluate.py uses, and
asserts the restored model reproduces the torch network's logits end to end.

Runs with smart features ENABLED (``disable_smart_features=False``) so the
feature-embedding MLP mapping — a path the other parity goldens never
exercise (they all disable it, as the production option file does) — gets
golden coverage too.
"""

import os
import sys

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
from dune_transformercvn_tpu.torch_import import import_reference_checkpoint

from test_reference_parity import (  # noqa: E402  (same-dir test helpers)
    _import_reference_network,
    _tiny_common,
    reference_inputs,
    t2n,
)

GLOBAL_STEP = 7


def _build_reference(common, seed=0, num_event_classes=4, num_prong_classes=8):
    NeutrinoDenseNetwork, RefOptions = _import_reference_network()
    ref_options = RefOptions()
    for key, value in common.items():
        setattr(ref_options, key, value)
    torch.manual_seed(seed)
    ref_net = NeutrinoDenseNetwork(
        ref_options, 6, 4, 3, num_prong_classes, num_event_classes
    ).eval()
    with torch.no_grad():  # trained-looking BN running stats
        for module in ref_net.modules():
            if isinstance(module, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                module.running_mean.normal_(0, 0.2)
                module.running_var.uniform_(0.7, 1.4)
    return ref_net


def _save_lightning_ckpt(ref_net, ds, path):
    """The on-disk shape of a reference ModelCheckpoint .ckpt: the trainer's
    state_dict holds the network under ``network.`` plus the frozen
    normalization statistics at top level."""
    sd = {f"network.{k}": v for k, v in ref_net.state_dict().items()}
    sd["mean"] = torch.from_numpy(ds.mean.copy())
    sd["std"] = torch.from_numpy(ds.std.copy())
    sd["extra_mean"] = torch.tensor(float(ds.extra_mean))
    sd["extra_std"] = torch.tensor(float(ds.extra_std))
    torch.save({"state_dict": sd, "global_step": GLOBAL_STEP, "epoch": 1}, path)


def _options(common, training_file, event_current_targets=True):
    options = Options()
    for key, value in common.items():
        setattr(options, key, value)
    options.compute_dtype = "float32"
    options.training_file = training_file
    options.event_current_targets = event_current_targets
    options.train_validation_split = 0.6
    options.num_gpu = 1
    options.batch_size = 4
    return options


# The option axes the reference actually varies (reference options.py:21-77):
# pre-norm transformer layers, log(1+v) pixel scaling, parameter-free ReLU
# linear blocks (linear_prelu_activation=0), the raw 10-class head (no
# event_current_targets 10->4 remap), and dropout>0 (which shifts the
# prong decoder's nn.Sequential module indices in the checkpoint — the
# layout the PRODUCTION option file trains with).
IMPORT_VARIANTS = {
    "base": {},
    "norm_first": {"transformer_norm_first": True},
    "log_pixels": {"log_pixels": True},
    "relu": {"linear_prelu_activation": False},
    "dropout": {"dropout": 0.1},
    "ten_class": {},  # event_current_targets=False below
}


@pytest.mark.parametrize("variant", sorted(IMPORT_VARIANTS))
def test_import_reference_checkpoint_end_to_end(tmp_path, variant):
    toggles = IMPORT_VARIANTS[variant]
    current = variant != "ten_class"
    common = dict(_tiny_common(False), disable_smart_features=False, **toggles)

    data = str(tmp_path / "import.h5")
    make_synthetic_file(data, num_events=16, num_features=6, num_extra=4, seed=3)
    ds = EventDataset(data, event_current_targets=current)
    ds.compute_statistics()

    ref_net = _build_reference(
        common,
        num_event_classes=ds.num_event_classes,
        num_prong_classes=ds.num_prong_classes,
    )
    ckpt_path = str(tmp_path / "ref.ckpt")
    _save_lightning_ckpt(ref_net, ds, ckpt_path)

    options = _options(common, data, event_current_targets=current)
    out_dir = str(tmp_path / "imported" / "version_0")
    import_reference_checkpoint(ckpt_path, options, out_dir, verbose=False)
    assert os.path.exists(os.path.join(out_dir, "options.json"))

    # ---- the evaluate.py restore flow --------------------------------------
    from dune_transformercvn_tpu.train.checkpoint import CheckpointManager
    from dune_transformercvn_tpu.train.loop import Trainer

    trainer = Trainer(options, run_dir=None, debug=True, verbose=False)
    manager = CheckpointManager(
        os.path.join(out_dir, "checkpoints"), top_k=options.checkpoint_top_k
    )
    assert manager.latest_step() == GLOBAL_STEP
    restored = manager.restore(jax.device_get(trainer.state))
    assert int(restored.step) == GLOBAL_STEP

    # normalization came from the checkpoint's frozen parameters (computed
    # over the FULL file above), not from the trainer's train split
    np.testing.assert_array_equal(np.asarray(restored.norm["mean"]), ds.mean)
    np.testing.assert_array_equal(np.asarray(restored.norm["std"]), ds.std)

    # ---- end-to-end logits: restored model == the torch reference ----------
    cfg = ModelConfig.from_options(
        options, ds.num_features, ds.num_extra, ds.pixel_features,
        ds.num_event_classes, ds.num_prong_classes,
    )
    model = TransformerCVN(cfg)
    B = 4
    batch = Batcher(ds, batch_size=B, coo_granularity=512).build_batch(np.arange(B))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    ours_ev, ours_pr = jax.jit(
        lambda v, b, n: model.apply(v, b, n, train=False)
    )(
        {"params": restored.params, "batch_stats": restored.batch_stats},
        jbatch,
        {k: jnp.asarray(v) for k, v in restored.norm.items()},
    )

    ref_inputs = reference_inputs(
        ds, B, log_pixels=common.get("log_pixels", False)
    )
    with torch.no_grad():
        ref_ev, ref_pr = ref_net(*ref_inputs)

    np.testing.assert_allclose(
        np.asarray(ours_ev), t2n(ref_ev), rtol=2e-3, atol=2e-4
    )
    real = t2n(ref_inputs[5]).astype(bool)
    np.testing.assert_allclose(
        np.asarray(ours_pr)[real], t2n(ref_pr)[real], rtol=2e-3, atol=2e-4
    )


def test_import_rejects_architecture_mismatch(tmp_path):
    """A checkpoint from a DIFFERENT architecture than the option file must
    fail loudly, never evaluate half-initialized weights."""
    common = _tiny_common(False)
    data = str(tmp_path / "mismatch.h5")
    make_synthetic_file(data, num_events=16, num_features=6, num_extra=4, seed=3)
    ds = EventDataset(data, event_current_targets=True)
    ds.compute_statistics()

    ref_net = _build_reference(dict(common, num_encoder_layers=3))
    ckpt_path = str(tmp_path / "ref.ckpt")
    _save_lightning_ckpt(ref_net, ds, ckpt_path)

    options = _options(common, data)  # options say 2 encoder layers
    with pytest.raises((KeyError, ValueError)):
        import_reference_checkpoint(
            ckpt_path, options, str(tmp_path / "imported"), verbose=False
        )


def test_import_rejects_activation_mismatch(tmp_path):
    """A ReLU-trained checkpoint (linear_prelu_activation=0) loaded under a
    PReLU option file leaves PReLU alphas unfilled — must reject loudly,
    never evaluate default-initialized activations."""
    common = _tiny_common(False)
    data = str(tmp_path / "actmismatch.h5")
    make_synthetic_file(data, num_events=16, num_features=6, num_extra=4, seed=3)
    ds = EventDataset(data, event_current_targets=True)
    ds.compute_statistics()

    ref_net = _build_reference(
        dict(common, linear_prelu_activation=False),
        num_event_classes=ds.num_event_classes,
        num_prong_classes=ds.num_prong_classes,
    )
    ckpt_path = str(tmp_path / "ref.ckpt")
    _save_lightning_ckpt(ref_net, ds, ckpt_path)

    options = _options(common, data)  # options say PReLU
    with pytest.raises((KeyError, ValueError)):
        import_reference_checkpoint(
            ckpt_path, options, str(tmp_path / "imported"), verbose=False
        )
