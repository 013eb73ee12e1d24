"""Pallas TPU kernels for the SMC hot loops.

These replace the reference's single OpenCL kernel
(``src/qinfer/gpu_models.py``) with a general mechanism: a fused
Bayes-update kernel parameterized by any elementwise log-likelihood, and a
merge-based systematic-resampling expand kernel that avoids XLA's slow
TPU gathers/scatters entirely.
"""

from .resample_expand import expand_sorted_segments, systematic_expand
from .fused_update import fused_bayes_update

__all__ = [
    "expand_sorted_segments",
    "systematic_expand",
    "fused_bayes_update",
]
