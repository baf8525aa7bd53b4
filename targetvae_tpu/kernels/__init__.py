"""Pallas TPU kernels for the hot paths (SURVEY.md section 2.7).

Each kernel has an XLA fallback; dispatch happens in the model layer based on
configuration and backend. Kernels are validated against the XLA path in
interpret mode on CPU (tests/test_kernels.py) and benchmarked on TPU.
"""

from .decoder_mlp import fused_decoder_mlp, decoder_kernel_supported

__all__ = ["fused_decoder_mlp", "decoder_kernel_supported"]
