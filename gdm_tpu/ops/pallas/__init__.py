"""Pallas TPU kernels for the hot fused ops.

Each kernel has an XLA fallback selected automatically off-TPU, so the
package stays runnable on CPU test platforms.
"""

from gdm_tpu.ops.pallas.similarity import cosine_argmax
