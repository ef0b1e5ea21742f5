"""Modular-arithmetic tensor ops: JAX (u64) reference path + Pallas TPU kernels."""

from .modmath import ModCtx, mulmod, addmod, submod, mul64wide

__all__ = ["ModCtx", "mulmod", "addmod", "submod", "mul64wide"]
