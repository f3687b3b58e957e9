"""Persistent XLA compilation cache.

Production configs cost 30-90 s per executable to compile on this class of
host (remote-compile helper, 1 core); the persistent cache keys on
HLO + compile flags + topology, so every CLI surface (train / evaluate /
export / bench) skips recompiles across processes.  Opt out with
DUNE_TCVN_NO_COMPILE_CACHE=1; relocate with JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/dune_tcvn_jax_cache"


def enable_compile_cache() -> bool:
    """Idempotently point JAX at the on-disk compilation cache."""
    if os.environ.get("DUNE_TCVN_NO_COMPILE_CACHE"):
        return False
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        return True
    except Exception:  # older jaxlib without the knob — run uncached
        return False


def enable_fast_prng() -> bool:
    """Use XLA's native RngBitGenerator ("rbg") instead of jax's default
    threefry for new PRNG keys.

    The production config runs dropout 0.1 inside every DenseNet
    bottleneck plus in-graph pixel noise; under threefry the mask
    generation lowers to ~34k u32 ops over the full activation tensors
    and costs 18% of the train step on a v5e (95.1 -> 77.6 ms/step
    measured at production scale, batch 16).  Random *streams* differ
    between impls but dropout masks and init draws carry no
    reference-parity requirement (golden tests transplant weights).
    Opt out with DUNE_TCVN_NO_FAST_PRNG=1.
    """
    if os.environ.get("DUNE_TCVN_NO_FAST_PRNG"):
        return False
    import jax

    try:
        jax.config.update("jax_default_prng_impl", "rbg")
        return True
    except Exception:
        return False
