"""dune_transformercvn_tpu — a TPU-native framework for TransformerCVN.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of the
ayankele/dune-transformercvn reference (PyTorch + Lightning + MinkowskiEngine):
simultaneous neutrino event classification and per-prong particle
classification from sparse pixel maps, with data-parallel training over a TPU
device mesh, streaming psum-able metrics, checkpoint/resume, evaluation, and
StableHLO export for C++ inference.
"""

__version__ = "0.1.0"

from .config import Options

__all__ = ["Options"]
