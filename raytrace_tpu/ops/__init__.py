"""Compute path: dispersion solver, gradients, Haselgrove RHS, kernels."""

from . import analytic, dispersion, gradients, rhs

__all__ = ["analytic", "dispersion", "gradients", "rhs"]
