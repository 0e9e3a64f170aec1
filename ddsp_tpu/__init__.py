"""ddsp_tpu: a TPU-native differentiable DSP framework (JAX/XLA/Pallas).

Feature-equivalent to the capabilities of kureta/ddsp-pytorch, redesigned
TPU-first.  See SURVEY.md for the layer map and parity contract.
"""

from ddsp_tpu.config import Config

__version__ = "0.1.0"
__all__ = ["Config", "__version__"]
