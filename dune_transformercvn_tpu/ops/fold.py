"""Eval-time BatchNorm folding for the DenseNet-family pixel embedders.

At eval, masked BatchNorm is a pure per-channel affine of its input
(ops/masked.py:78-79,126-133): ``y = a * x + d`` with
``a = scale * rsqrt(var + eps)`` and ``d = bias - mean * a``.  Wherever a
convolution's output feeds a BatchNorm directly (the DenseNet stem
``conv7x7 -> BN`` and every bottleneck's ``conv1x1 -> BN``,
models/densenet.py:38-43,94-110; reference dense_net.py:111-122,124-137),
that affine can be absorbed into the conv's own weights:

    W'[..., c] = W[..., c] * a[c]          b'[c] = b[c] * a[c] + d[c]

and the BatchNorm replaced by the identity (scale=1, bias=0, mean=0,
var=1-eps, so ``rsqrt(var+eps) == 1`` exactly).  The serving graph then
skips those normalize passes entirely — the byte-level lever identified by
the round-3 profiling (the deployed step is HBM-bound in the BN/PReLU
elementwise chains, PARITY.md int8 section).

This is a pure *variables* transformation: the model graph is unchanged
(same module tree, so exported artifacts, checkpoints, and the quantized
interceptor all compose), and ``BN(conv(x)) == conv'(x)`` holds exactly in
real arithmetic — fp32 logits match to reassociation rounding
(tests/test_fold.py).

Not folded (documented):

* BN -> PReLU -> conv sites (bottleneck entries, transitions): the PReLU
  nonlinearity sits between the affine and the conv, so there is nothing
  sound to absorb.
* The output block's ``Dense(use_bias=False) -> BN``: absorbing ``d``
  needs a bias parameter the checkpointed tree does not have (and the
  [N, D] matmul is microseconds anyway).
* Non-DenseNet families (sdxl uses GroupNorm; mobilenet/resnet serve via
  the dense default) — ``fold_eval_batchnorm`` returns the variables
  unchanged for them.
* The COO family's sparse stem (its stem weights live in the Pallas
  gather-matmul-scatter path); its bottlenecks still fold.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-5  # MaskedBatchNorm default (models never override it)


def _copy_tree(tree):
    """Recursive shallow copy of nested dicts (leaves shared)."""
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree


def _get(tree, path: Sequence[str]):
    for key in path:
        tree = tree[key]
    return tree


def _embedder_pairs(scope_params: Dict) -> Tuple[Tuple[Tuple[str, ...], Tuple[str, ...]], ...]:
    """(conv_path, bn_path) pairs inside one DenseNet embedder scope."""
    pairs = []
    # stem conv7x7 -> post-stem BN (dense family only; the COO family's
    # stem is the sparse kernel, not a top-level Conv_0)
    if "Conv_0" in scope_params and "MaskedBatchNorm_0" in scope_params:
        pairs.append((("Conv_0",), ("MaskedBatchNorm_0",)))
    for name in scope_params:
        if name.startswith("Bottleneck_"):
            pairs.append(((name, "Conv_0"), (name, "MaskedBatchNorm_1")))
    return tuple(pairs)


def _is_densenet_scope(scope_params) -> bool:
    return isinstance(scope_params, dict) and any(
        k.startswith("Bottleneck_") for k in scope_params
    )


def count_foldable(params) -> int:
    """Number of conv->BN adjacencies :func:`fold_eval_batchnorm` would fold
    — pure tree-structure inspection (no tracing), so callers can gate the
    jitted fold without relying on trace-time side effects."""
    count = 0
    for scope in ("event_pixel_embedding", "prong_pixel_embedding"):
        if scope in params and _is_densenet_scope(params[scope]):
            count += len(_embedder_pairs(params[scope]))
    return count


def fold_eval_batchnorm(variables) -> Tuple[Dict, int]:
    """Fold every conv->BN adjacency in the DenseNet-family embedders.

    Takes the full model ``variables`` ({'params', 'batch_stats'}), returns
    ``(folded_variables, num_folds)``.  Arrays stay fp32 (the params'
    storage dtype); the result is valid ONLY for eval/export graphs
    (``train=False``) — a training step would update the identity stats.
    """
    params = _copy_tree(variables["params"])
    stats = _copy_tree(variables["batch_stats"])
    folds = 0
    for scope in ("event_pixel_embedding", "prong_pixel_embedding"):
        if scope not in params or not _is_densenet_scope(params[scope]):
            continue
        for conv_path, bn_path in _embedder_pairs(params[scope]):
            conv = _get(params[scope], conv_path)
            bn_p = _get(params[scope], bn_path)
            bn_s = _get(stats[scope], bn_path)

            inv = jax.lax.rsqrt(jnp.asarray(bn_s["var"], jnp.float32) + _EPS)
            a = jnp.asarray(bn_p["scale"], jnp.float32) * inv
            d = (
                jnp.asarray(bn_p["bias"], jnp.float32)
                - jnp.asarray(bn_s["mean"], jnp.float32) * a
            )

            conv["kernel"] = jnp.asarray(conv["kernel"], jnp.float32) * a
            conv["bias"] = jnp.asarray(conv["bias"], jnp.float32) * a + d
            # identity BN: (x - 0) * rsqrt((1-eps) + eps) * 1 + 0 == x
            bn_p["scale"] = jnp.ones_like(a)
            bn_p["bias"] = jnp.zeros_like(d)
            bn_s["mean"] = jnp.zeros_like(d)
            bn_s["var"] = jnp.full_like(a, 1.0 - _EPS)
            folds += 1
    return {"params": params, "batch_stats": stats}, folds
