"""Import a trained reference checkpoint into this framework's run-dir format.

A user of ayankele/dune-transformercvn arrives with PyTorch Lightning
checkpoints (reference train.py:107-114: ``ModelCheckpoint`` .ckpt files
whose ``state_dict`` holds the network under the trainer's ``network.``
prefix, neutrino_full_base_trainer.py:55, plus the frozen normalization
statistics ``mean``/``std``/``extra_mean``/``extra_std`` registered by
neutrino_base.py:32-45).  This module converts such a checkpoint — or a bare
``NeutrinoDenseNetwork`` state_dict — into a ``version_N``-style run
directory (``options.json`` + an orbax checkpoint) that ``evaluate.py`` and
``dune_transformercvn_tpu.export`` consume directly, so switching frameworks
does not force retraining.

The weight mapping is the same one the golden-parity tests use to prove
bit-level agreement with the reference network (tests/test_reference_parity
transplants through these functions and asserts matching logits at the
production scale), extended here with:

* the feature-embedding MLP stack (prong_feature_embedding.py:36-79) for
  checkpoints trained with smart features enabled (the reference creates
  those parameters even when ``disable_smart_features`` is set, so they are
  skipped exactly when our model has no such subtree);
* completeness + shape validation: every parameter/BN-statistic leaf of the
  freshly-built model must be assigned exactly once from the checkpoint,
  with the template's shape — unmapped leaves or architecture mismatches
  (wrong option file for the checkpoint) fail loudly instead of silently
  evaluating half-initialized weights.

Only the flagship dense family is importable (``options.embedder ==
"dense"``): the reference's production checkpoints are dense, and the sparse
families' torch parameters live inside MinkowskiEngine modules with no
trained public checkpoints to migrate.  Optimizer moments are NOT carried
over (Adam state is an artifact of the training run, not of the model); the
imported state carries a fresh optimizer and the checkpoint's
``global_step``, suitable for evaluation/export or fine-tuning.

CLI::

    python -m dune_transformercvn_tpu.torch_import ckpt.ckpt \
        -o options.json --out imported/version_0
    python evaluate.py imported/version_0 --checkpoint last
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np

# ---------------------------------------------------------------------------
# tensor/key helpers (shared with tests/test_reference_parity.py)
# ---------------------------------------------------------------------------


def t2n(tensor):
    """torch tensor -> numpy copy.

    ``.copy()``: ``.numpy()`` returns a VIEW of torch storage, which an
    in-place optimizer step would silently mutate after transplanting."""
    return tensor.detach().numpy().copy()


def conv_w(sd, key):
    """torch OIHW conv weight -> flax HWIO."""
    return t2n(sd[key]).transpose(2, 3, 1, 0)


def set_bn(params, stats, sd, prefix):
    params["scale"] = t2n(sd[f"{prefix}.weight"])
    params["bias"] = t2n(sd[f"{prefix}.bias"])
    stats["mean"] = t2n(sd[f"{prefix}.running_mean"])
    stats["var"] = t2n(sd[f"{prefix}.running_var"])


def map_densenet(sd, ref_prefix, params, stats, blocks):
    """DenseNet embedder (reference dense_net.py): stem, bottleneck/
    transition chain, final norm and output block."""
    params["Conv_0"]["kernel"] = conv_w(sd, f"{ref_prefix}.features.conv0.weight")
    params["Conv_0"]["bias"] = t2n(sd[f"{ref_prefix}.features.conv0.bias"])
    set_bn(params["MaskedBatchNorm_0"], stats["MaskedBatchNorm_0"],
           sd, f"{ref_prefix}.features.norm0")
    params["PReLU_0"]["alpha"] = t2n(sd[f"{ref_prefix}.features.relu0.weight"])

    bottleneck = transition = 0
    for i, n in enumerate(blocks):
        for j in range(n):
            rp = f"{ref_prefix}.features.dense{i + 1}.layers.{j}"
            fp = params[f"Bottleneck_{bottleneck}"]
            fs = stats[f"Bottleneck_{bottleneck}"]
            set_bn(fp["MaskedBatchNorm_0"], fs["MaskedBatchNorm_0"],
                   sd, f"{rp}.bottleneck_block.norm1")
            fp["PReLU_0"]["alpha"] = t2n(sd[f"{rp}.bottleneck_block.relu1.weight"])
            fp["Conv_0"]["kernel"] = conv_w(sd, f"{rp}.bottleneck_block.conv1.weight")
            fp["Conv_0"]["bias"] = t2n(sd[f"{rp}.bottleneck_block.conv1.bias"])
            set_bn(fp["MaskedBatchNorm_1"], fs["MaskedBatchNorm_1"],
                   sd, f"{rp}.output_block.norm2")
            fp["PReLU_1"]["alpha"] = t2n(sd[f"{rp}.output_block.relu2.weight"])
            fp["Conv_1"]["kernel"] = conv_w(sd, f"{rp}.output_block.conv2.weight")
            fp["Conv_1"]["bias"] = t2n(sd[f"{rp}.output_block.conv2.bias"])
            bottleneck += 1
        if i != len(blocks) - 1:
            rp = f"{ref_prefix}.features.transition{i + 1}"
            fp = params[f"Transition_{transition}"]
            fs = stats[f"Transition_{transition}"]
            set_bn(fp["MaskedBatchNorm_0"], fs["MaskedBatchNorm_0"], sd, f"{rp}.norm")
            fp["PReLU_0"]["alpha"] = t2n(sd[f"{rp}.relu.weight"])
            fp["Conv_0"]["kernel"] = conv_w(sd, f"{rp}.conv.weight")
            fp["Conv_0"]["bias"] = t2n(sd[f"{rp}.conv.bias"])
            transition += 1

    set_bn(params["MaskedBatchNorm_1"], stats["MaskedBatchNorm_1"],
           sd, f"{ref_prefix}.features.final_norm")
    params["PReLU_1"]["alpha"] = t2n(sd[f"{ref_prefix}.features.final_relu.weight"])
    params["Dense_0"]["kernel"] = t2n(sd[f"{ref_prefix}.output_block.linear.weight"]).T
    set_bn(params["MaskedBatchNorm_2"], stats["MaskedBatchNorm_2"],
           sd, f"{ref_prefix}.output_block.norm")
    params["PReLU_2"]["alpha"] = t2n(sd[f"{ref_prefix}.output_block.relu.weight"])


def map_encoder_layer(sd, ref_prefix, params, hidden_dim, heads):
    """One ``nn.TransformerEncoderLayer`` (packed in-proj) -> our flax layer."""
    hd = hidden_dim // heads
    in_w = t2n(sd[f"{ref_prefix}.self_attn.in_proj_weight"])
    in_b = t2n(sd[f"{ref_prefix}.self_attn.in_proj_bias"])
    mha = params["MultiHeadDotProductAttention_0"]
    D = hidden_dim
    for i, name in enumerate(["query", "key", "value"]):
        mha[name]["kernel"] = in_w[i * D:(i + 1) * D].T.reshape(D, heads, hd)
        mha[name]["bias"] = in_b[i * D:(i + 1) * D].reshape(heads, hd)
    mha["out"]["kernel"] = t2n(
        sd[f"{ref_prefix}.self_attn.out_proj.weight"]
    ).T.reshape(heads, hd, D)
    mha["out"]["bias"] = t2n(sd[f"{ref_prefix}.self_attn.out_proj.bias"])
    params["Dense_0"]["kernel"] = t2n(sd[f"{ref_prefix}.linear1.weight"]).T
    params["Dense_0"]["bias"] = t2n(sd[f"{ref_prefix}.linear1.bias"])
    params["Dense_1"]["kernel"] = t2n(sd[f"{ref_prefix}.linear2.weight"]).T
    params["Dense_1"]["bias"] = t2n(sd[f"{ref_prefix}.linear2.bias"])
    params["LayerNorm_0"]["scale"] = t2n(sd[f"{ref_prefix}.norm1.weight"])
    params["LayerNorm_0"]["bias"] = t2n(sd[f"{ref_prefix}.norm1.bias"])
    params["LayerNorm_1"]["scale"] = t2n(sd[f"{ref_prefix}.norm2.weight"])
    params["LayerNorm_1"]["bias"] = t2n(sd[f"{ref_prefix}.norm2.bias"])


def sequential_linear_blocks(sd, prefix):
    """Group a reference ``nn.Sequential`` of ``create_linear_block`` output
    (encoder.py:10-24: Linear, optional BatchNorm1d, PReLU-or-ReLU, optional
    Dropout) into ``(linear_idx, bn_idx_or_None, prelu_idx_or_None)`` tuples.

    Module indices shift with the option toggles — ``dropout > 0`` inserts a
    parameter-free module per block, ``linear_prelu_activation=0`` swaps the
    parameterized PReLU for a parameter-free ReLU — so a fixed index stride
    mis-parses real checkpoints (the production option file trains with
    dropout 0.1).  Instead, classify by the parameters actually present:
    a 2-D ``.weight`` starts a block (Linear), a ``.running_mean`` is its
    BatchNorm, a 1-D ``.weight`` without running stats is its PReLU.
    """
    indices = sorted({
        int(key[len(prefix) + 1:].split(".")[0])
        for key in sd.keys()
        if key.startswith(prefix + ".")
    })
    blocks = []
    for idx in indices:
        if f"{prefix}.{idx}.running_mean" in sd:
            if not blocks or blocks[-1][1] is not None:
                raise KeyError(
                    f"unexpected BatchNorm at {prefix}.{idx} with no "
                    "preceding Linear"
                )
            blocks[-1][1] = idx
        elif sd[f"{prefix}.{idx}.weight"].ndim == 2:
            blocks.append([idx, None, None])
        else:  # 1-D weight, no running stats: PReLU alpha
            if not blocks or blocks[-1][2] is not None:
                raise KeyError(
                    f"unexpected PReLU at {prefix}.{idx} with no "
                    "preceding Linear"
                )
            blocks[-1][2] = idx
    return [tuple(b) for b in blocks]


def map_feature_embedding(sd, ref_prefix, params, stats):
    """ProngFeatureEmbedding's LinearBlock stack (prong_feature_embedding.py:
    36-79) -> our ``FeatureEmbedding`` (models/blocks.py): block ``i`` is
    linear(+bias iff no BN) / BatchNorm1d / PReLU-or-ReLU."""
    i = 0
    while f"{ref_prefix}.embedding.{i}.linear.weight" in sd:
        rp = f"{ref_prefix}.embedding.{i}"
        block = params[f"LinearBlock_{i}"]
        block["Dense_0"]["kernel"] = t2n(sd[f"{rp}.linear.weight"]).T
        if f"{rp}.linear.bias" in sd:
            block["Dense_0"]["bias"] = t2n(sd[f"{rp}.linear.bias"])
        if f"{rp}.norm.weight" in sd:
            set_bn(block["MaskedBatchNorm_0"],
                   stats[f"LinearBlock_{i}"]["MaskedBatchNorm_0"],
                   sd, f"{rp}.norm")
        if f"{rp}.activation.weight" in sd:
            block["PReLU_0"]["alpha"] = t2n(sd[f"{rp}.activation.weight"])
        i += 1
    if i == 0:
        raise KeyError(
            f"no feature-embedding blocks under '{ref_prefix}.embedding' in "
            "the checkpoint, but the model was built with smart features "
            "enabled (disable_smart_features=0)"
        )


# ---------------------------------------------------------------------------
# whole-network transplant
# ---------------------------------------------------------------------------


def _infer_densenet_blocks(sd, ref_prefix) -> List[int]:
    """Recover ``densenet_structure`` from the checkpoint's key layout."""
    blocks = []
    i = 1
    while f"{ref_prefix}.features.dense{i}.layers.0.bottleneck_block.conv1.weight" in sd:
        j = 0
        while (f"{ref_prefix}.features.dense{i}.layers.{j}"
               ".bottleneck_block.conv1.weight") in sd:
            j += 1
        blocks.append(j)
        i += 1
    if not blocks:
        raise KeyError(
            f"no DenseNet blocks under '{ref_prefix}.features' — is this a "
            "dense-family reference checkpoint?"
        )
    return blocks


def transplant_dense_network(sd, params, stats, heads: int) -> None:
    """Map a reference ``NeutrinoDenseNetwork`` state_dict (WITHOUT the
    Lightning ``network.`` prefix) onto our ``TransformerCVN`` param/
    batch-stats trees, in place.

    Layer counts and widths are derived from the checkpoint's own key
    layout; only the head count (which shapes cannot disambiguate) comes
    from the caller.  Structural agreement with the option file is enforced
    afterwards by :func:`_validate_filled` in the import flow (the golden
    tests enforce it by construction).
    """
    blocks = _infer_densenet_blocks(sd, "prong_embedding.event_pixel_embedding")
    map_densenet(sd, "prong_embedding.event_pixel_embedding",
                 params["event_pixel_embedding"],
                 stats["event_pixel_embedding"], blocks)
    map_densenet(sd, "prong_embedding.prong_pixel_embedding",
                 params["prong_pixel_embedding"],
                 stats["prong_pixel_embedding"], blocks)
    params["event_position_embedding"] = t2n(
        sd["prong_embedding.event_position_embedding"])
    params["prong_position_embedding"] = t2n(
        sd["prong_embedding.prong_position_embedding"])

    ce = params["combined_embedding"]
    ce["Dense_0"]["kernel"] = t2n(
        sd["prong_embedding.combined_embedding.linear.weight"]).T
    if "prong_embedding.combined_embedding.linear.bias" in sd:
        ce["Dense_0"]["bias"] = t2n(
            sd["prong_embedding.combined_embedding.linear.bias"])
    set_bn(ce["MaskedBatchNorm_0"],
           stats["combined_embedding"]["MaskedBatchNorm_0"],
           sd, "prong_embedding.combined_embedding.norm")
    # LinearBlock's activation is PReLU (learned alpha) or a parameter-free
    # ReLU depending on options.linear_prelu_activation
    # (prong_feature_embedding.py:18-21)
    if "prong_embedding.combined_embedding.activation.weight" in sd:
        ce["PReLU_0"]["alpha"] = t2n(
            sd["prong_embedding.combined_embedding.activation.weight"])

    # the reference creates feature-embedding parameters even when smart
    # features are disabled (neutrino_full_base_network.py:55, module path
    # prong_embedding.feature_embedding); our model only has the subtree
    # when they are enabled — map iff we need them
    if "feature_embedding" in params:
        map_feature_embedding(sd, "prong_embedding.feature_embedding",
                              params["feature_embedding"],
                              stats.get("feature_embedding", {}))

    hidden = int(sd["encoder.encoder.layers.0.self_attn.in_proj_weight"].shape[1])
    layer = 0
    while f"encoder.encoder.layers.{layer}.self_attn.in_proj_weight" in sd:
        map_encoder_layer(
            sd, f"encoder.encoder.layers.{layer}",
            params["encoder"][f"EncoderLayer_{layer}"], hidden, heads,
        )
        layer += 1

    params["event_decoder"]["Dense_0"]["kernel"] = t2n(
        sd["event_decoder.hidden_layer.weight"]).T
    params["event_decoder"]["Dense_0"]["bias"] = t2n(
        sd["event_decoder.hidden_layer.bias"])

    pd = params["prong_decoder"]
    pd_stats = stats["prong_decoder"]
    for i, (lin, bn, act) in enumerate(
        sequential_linear_blocks(sd, "prong_decoder.hidden_layers")
    ):
        block = pd[f"LinearBlock_{i}"]
        block["Dense_0"]["kernel"] = t2n(
            sd[f"prong_decoder.hidden_layers.{lin}.weight"]).T
        block["Dense_0"]["bias"] = t2n(
            sd[f"prong_decoder.hidden_layers.{lin}.bias"])
        if bn is not None:
            set_bn(block["MaskedBatchNorm_0"],
                   pd_stats[f"LinearBlock_{i}"]["MaskedBatchNorm_0"],
                   sd, f"prong_decoder.hidden_layers.{bn}")
        if act is not None:
            block["PReLU_0"]["alpha"] = t2n(
                sd[f"prong_decoder.hidden_layers.{act}.weight"])
    pd["Dense_0"]["kernel"] = t2n(sd["prong_decoder.output_layer.weight"]).T
    pd["Dense_0"]["bias"] = t2n(sd["prong_decoder.output_layer.bias"])


# ---------------------------------------------------------------------------
# checkpoint-file plumbing
# ---------------------------------------------------------------------------

_NORM_KEYS = ("mean", "std", "extra_mean", "extra_std")


class _TrackedDict(dict):
    """state_dict wrapper recording which keys the transplant consumed, so
    unexpectedly-unused checkpoint weights surface as a warning."""

    def __init__(self, data):
        super().__init__(data)
        self.accessed = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)


def strip_network_prefix(sd) -> Dict[str, Any]:
    """Lightning trainer checkpoints hold the network under ``network.``
    (neutrino_full_base_trainer.py:55); bare network state_dicts do not.
    Normalization statistics stay top-level either way."""
    if not any(key.startswith("network.") for key in sd):
        return dict(sd)
    out = {}
    for key, value in sd.items():
        if key.startswith("network."):
            out[key[len("network."):]] = value
        else:
            out[key] = value
    return out


def extract_norm(sd) -> Optional[Dict[str, np.ndarray]]:
    """The frozen normalization parameters (neutrino_base.py:32-45), if the
    checkpoint was trained with ``normalize_features``."""
    if not all(k in sd for k in _NORM_KEYS):
        return None
    return {k: t2n(sd[k]) for k in _NORM_KEYS}


def _none_tree(template):
    if isinstance(template, dict):
        return {k: _none_tree(v) for k, v in template.items()}
    return None


def _validate_filled(template, filled, path: str) -> None:
    """Every template leaf must be assigned, with the template's shape."""
    if isinstance(template, dict):
        for key, sub in template.items():
            _validate_filled(sub, filled[key], f"{path}/{key}")
        extra = set(filled) - set(template)
        if extra:
            raise ValueError(f"transplant wrote unknown keys at {path}: {sorted(extra)}")
        return
    if filled is None:
        raise ValueError(
            f"checkpoint did not cover model leaf {path} — the option file's "
            "architecture does not match the checkpoint (or uses a variant "
            "feature the reference checkpoint cannot provide)"
        )
    got, want = np.shape(filled), np.shape(template)
    if got != want:
        raise ValueError(f"shape mismatch at {path}: checkpoint {got}, model {want}")


def import_reference_checkpoint(
    ckpt_path: str,
    options,
    out_dir: str,
    verbose: bool = True,
) -> str:
    """Convert a reference checkpoint into an evaluate.py-ready run dir.

    Returns ``out_dir``.  ``options`` must describe the checkpoint's
    architecture (the reference dumps the matching ``options.json`` beside
    its logs, train.py:145-149) and point ``training_file`` at an available
    dataset (evaluation needs data anyway; normalization statistics are
    taken from the checkpoint when present, falling back to the dataset's).
    """
    import torch

    if getattr(options, "embedder", "dense") != "dense":
        raise ValueError(
            "only the flagship dense family has importable reference "
            f"checkpoints (options.embedder = {options.embedder!r})"
        )

    payload = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    global_step = int(payload.get("global_step", 0)) if isinstance(payload, dict) else 0
    sd = _TrackedDict(strip_network_prefix(state_dict))

    # Template state from the SAME machinery evaluate.py uses, so the saved
    # pytree restores structurally exactly.
    from .train.loop import Trainer

    trainer = Trainer(options, run_dir=None, debug=True, verbose=False)
    import jax

    state = jax.device_get(trainer.state)

    params = _none_tree(state.params)
    stats = _none_tree(state.batch_stats)
    transplant_dense_network(sd, params, stats, heads=options.num_attention_heads)
    _validate_filled(state.params, params, "params")
    _validate_filled(state.batch_stats, stats, "batch_stats")

    norm = extract_norm(sd)
    if norm is None:
        if verbose:
            print("checkpoint carries no normalization statistics "
                  "(normalize_features off?) — keeping the dataset's")
        norm = state.norm
    else:
        for key, value in norm.items():
            want = np.shape(state.norm[key])
            if np.shape(value) != want:
                raise ValueError(
                    f"normalization statistic {key!r} shape {np.shape(value)} "
                    f"does not match the dataset's {want}"
                )

    unused = set(sd) - sd.accessed - set(_NORM_KEYS)
    expected_unused = {k for k in unused if k.endswith("num_batches_tracked")}
    surprising = sorted(unused - expected_unused)
    if surprising and verbose:
        print(f"WARNING: {len(surprising)} checkpoint keys were not used: "
              f"{surprising[:8]}{' ...' if len(surprising) > 8 else ''}")

    new_state = state.replace(
        params=params,
        batch_stats=stats,
        norm={k: np.asarray(v) for k, v in norm.items()},
        step=np.asarray(global_step, np.int32),
    )

    os.makedirs(out_dir, exist_ok=True)
    options.save(os.path.join(out_dir, "options.json"))
    from .train.checkpoint import CheckpointManager

    manager = CheckpointManager(
        os.path.join(out_dir, "checkpoints"), top_k=options.checkpoint_top_k
    )
    manager.save(new_state, global_step, metric_value=None)
    manager.close()
    if verbose:
        print(f"Imported {ckpt_path} (global_step {global_step}) -> {out_dir}")
        print(f"Evaluate with: python evaluate.py {out_dir} --checkpoint last")
    return out_dir


def main():
    from argparse import ArgumentParser

    parser = ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", help="reference .ckpt (Lightning) or raw state_dict")
    parser.add_argument("-o", "--options_file", required=True,
                        help="the run's options.json (dumped beside the reference logs)")
    parser.add_argument("--out", required=True,
                        help="output run directory (evaluate.py-compatible)")
    parser.add_argument("--training_file", default=None,
                        help="override options.training_file (dataset to "
                             "build the model against)")
    args = parser.parse_args()

    from .config import Options

    options = Options.load(args.options_file)
    if args.training_file:
        options.training_file = args.training_file
    import_reference_checkpoint(args.checkpoint, options, args.out)


if __name__ == "__main__":
    main()
