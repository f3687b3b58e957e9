"""Post-training int8 quantization for the inference path.

Motivation: the production inference step is HBM-bandwidth-bound
(PARITY.md roofline study: conv fusions ~50% of device time at 600-800
GB/s analytic), and the v5e MXU doubles per-cycle int8 throughput
(394 TOPS int8 vs 197 TFLOP/s bf16).  Measured outcome (PARITY.md,
``artifacts/int8_drift_v5e.json``): accuracy drift is negligible (argmax
agreement 1.0 event+prong, max prob delta <0.01) but throughput is
**0.96x — a measured neutral** on this network: the quantize/dequantize
elementwise passes add bytes at exactly the layer boundaries where the
bf16 path's BN/PReLU chains are already at the HBM roofline, and the
convs' MXU time is not the binding constraint.  The path is kept as a
serving capability (hardware with a wider int8/bf16 gap, or int8-in
-int8-out fusion futures), not a performance default.

Design (standard symmetric PTQ, TPU-shaped):

* **Weights**: per-output-channel symmetric int8, quantized inline from
  the fp32 params (cheap: the kernels are tiny next to the conv itself,
  and XLA hoists the requant math out of the image loop).
* **Activations**: per-tensor symmetric int8 with scales calibrated
  offline by running a handful of real batches through the bf16 network
  and recording each conv input's max-|x| (``calibrate_activation_scales``).
  The quantize op fuses into the producing BN/PReLU elementwise chain, so
  the tensor that lands in HBM between layers is int8 — half the bytes the
  bf16 path moves.
* **Integration**: a Flax method interceptor
  (:func:`quantized_convs`) swaps every supported ``nn.Conv.__call__``
  for the int8 gemm at trace time.  No model changes: the same transform
  serves every embedder family.  Convs with no calibrated scale (or with
  dilation/grouping the int8 path does not support) fall through to the
  bf16 implementation unchanged.

The reference has no quantized path (its TorchScript export runs fp32/
fp16 CUDA — CreateCompiled.ipynb cells 6-14); this is a beyond-parity
serving feature.  Accuracy is measured, not assumed: see
``tools/int8_drift.py`` and ``tests/test_quant.py`` (argmax agreement +
probability drift vs the bf16 path).
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.linear import canonicalize_padding


def _conv_path(context) -> str:
    return "/".join(str(p) for p in context.module.path)


def _tree_get(params: Mapping[str, Any], path) -> Optional[Mapping[str, Any]]:
    node: Any = params
    for name in path:
        if not isinstance(node, Mapping) or name not in node:
            return None
        node = node[name]
    return node if isinstance(node, Mapping) else None


def _supported(mod: nn.Conv) -> bool:
    """int8 path covers the conv shapes the models actually use: 2-D,
    undilated, ungrouped, channels-last."""

    def _all_one(v) -> bool:
        if v is None or isinstance(v, int):
            return (v or 1) == 1
        return all(int(e) == 1 for e in v)

    kernel_size = mod.kernel_size
    rank = 1 if isinstance(kernel_size, int) else len(kernel_size)
    padding_ok = (
        mod.padding in ("SAME", "VALID")
        if isinstance(mod.padding, str)
        else True
    )
    return (
        rank == 2
        and mod.feature_group_count == 1
        and _all_one(mod.input_dilation)
        and _all_one(mod.kernel_dilation)
        and padding_ok
    )


def _broadcast(v, rank: int):
    if v is None:
        return (1,) * rank
    if isinstance(v, int):
        return (v,) * rank
    return tuple(v)


def quantize_weight(kernel: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of an HWIO kernel.

    Returns ``(q_kernel int8, scale fp32[C_out])``.
    """
    k = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1))) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    mod: nn.Conv,
    act_scale: float,
) -> jnp.ndarray:
    """int8 x int8 -> int32 convolution with flax ``nn.Conv`` semantics
    (NHWC, HWIO, int/str padding, strides), dequantized to ``mod.dtype``."""
    rank = kernel.ndim - 2
    strides = _broadcast(mod.strides, rank)
    padding = canonicalize_padding(mod.padding, rank)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    s_x = jnp.asarray(act_scale, jnp.float32)
    qx = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s_x), -127, 127
    ).astype(jnp.int8)
    qk, s_w = quantize_weight(kernel)
    y = jax.lax.conv_general_dilated(
        qx,
        qk,
        strides,
        padding,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_w * s_x)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    out_dtype = mod.dtype or x.dtype
    return y.astype(out_dtype)


@contextlib.contextmanager
def quantized_convs(params: Mapping[str, Any], act_scales: Dict[str, float]):
    """Trace-time context: every supported ``nn.Conv`` whose module path has
    a calibrated activation scale executes as an int8 convolution.

    ``params``: the model's param tree (``variables["params"]``) — the
    interceptor reads kernels/biases from it by module path, so it works
    for any embedder family without the modules declaring anything.
    Must wrap the ``model.apply`` call *inside* the jitted function.
    """

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (
            type(mod) is not nn.Conv
            or context.method_name != "__call__"
            or not _supported(mod)
        ):
            return next_fun(*args, **kwargs)
        scale = act_scales.get(_conv_path(context))
        if scale is None or not (scale > 0):
            return next_fun(*args, **kwargs)
        leaf = _tree_get(params, mod.path)
        if leaf is None or "kernel" not in leaf:
            return next_fun(*args, **kwargs)
        return int8_conv(
            args[0], leaf["kernel"], leaf.get("bias"), mod, scale
        )

    with nn.intercept_methods(interceptor):
        yield


def make_calibration_fn(model):
    """Returns ``fn(variables, batch, norm) -> {conv_path: max|x|}`` — a
    jittable forward pass that records each conv input's max-abs.  Feed it
    a few representative batches and take the per-path max on the host."""

    def calibrate(variables, batch, norm):
        records: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if type(mod) is nn.Conv and context.method_name == "__call__":
                key = _conv_path(context)
                m = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                prev = records.get(key)
                records[key] = m if prev is None else jnp.maximum(prev, m)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, batch, norm, train=False)
        return records

    return calibrate


def calibrate_activation_scales(
    model, variables, batches, norm, *, headroom: float = 1.0
) -> Dict[str, float]:
    """Run ``batches`` through the bf16 network and return per-conv-path
    activation scales ``max|x| * headroom / 127``.

    One jitted trace per distinct batch shape; the returned dict of Python
    floats is baked into the quantized graph as constants.
    """
    calibrate = jax.jit(make_calibration_fn(model))
    maxima: Dict[str, float] = {}
    for batch in batches:
        rec = jax.device_get(calibrate(variables, batch, norm))
        for key, value in rec.items():
            maxima[key] = max(maxima.get(key, 0.0), float(value))
    return {
        key: (value * headroom) / 127.0
        for key, value in maxima.items()
        if value > 0.0
    }
