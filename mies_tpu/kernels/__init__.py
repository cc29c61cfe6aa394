"""Pallas TPU kernels for the non-XLA-friendly hot stages.

Everything here has a pure-jnp twin in ``mies_tpu.ops`` that defines the
semantics; kernels must produce identical results (tests compare them
directly, and the CLAHE path is cross-checked against cv2).
"""

from mies_tpu.kernels.bilateral import bilateral_batched, bilateral_tpu
from mies_tpu.kernels.clahe import clahe_apply_lut, clahe_batched, clahe_tpu

__all__ = ["bilateral_batched", "bilateral_tpu", "clahe_apply_lut", "clahe_batched", "clahe_tpu"]
