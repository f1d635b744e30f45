"""Pallas TPU kernels for the hot image ops (inference paths).

CPU tests run these in interpret mode; on TPU they compile to Mosaic.
"""

from rgie_tpu.ops.pallas.pointwise_chain import (
    fused_pointwise_chain,
    reference_pointwise_chain,
)
