"""Pallas TPU kernels for the hot local-step ops."""

from .tet_local import arap_local_step, arap_local_step_reference

__all__ = ["arap_local_step", "arap_local_step_reference"]
