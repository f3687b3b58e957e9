"""dune_transformercvn_tpu — a TPU-native framework for TransformerCVN.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of the
ayankele/dune-transformercvn reference (PyTorch + Lightning + MinkowskiEngine):
simultaneous neutrino event classification and per-prong particle
classification from sparse pixel maps, with data-parallel training over a TPU
device mesh, streaming psum-able metrics, checkpoint/resume, evaluation, and
StableHLO export for C++ inference.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("DUNE_TCVN_PLATFORM"):
    # Explicit platform override (e.g. DUNE_TCVN_PLATFORM=cpu for smoke
    # runs / CI on hosts whose site config pins an accelerator platform
    # ahead of the JAX_PLATFORMS env var).  Must land before the backend
    # initializes, hence at package import.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["DUNE_TCVN_PLATFORM"])

from .config import Options

__all__ = ["Options"]
