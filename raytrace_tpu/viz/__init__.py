"""Host-side visualization (matplotlib), mirroring reference C22-C25."""

from .plots import (
    plot_density_profile,
    plot_diagnostics,
    plot_environment,
    plot_ray_paths,
    plot_refractive_surface,
)

__all__ = [
    "plot_density_profile",
    "plot_diagnostics",
    "plot_environment",
    "plot_ray_paths",
    "plot_refractive_surface",
]
