"""raytrace_tpu: a TPU-native (JAX/XLA/Pallas) whistler ray-tracing framework.

Rebuilds the capabilities of the Julia reference `andersontodds/ray-trace`
(Haselgrove ray equations, Stix cold-plasma dispersion, dipole field,
Carpenter-Anderson 1992 plasmasphere) as a vmap-first, autodiff-driven,
ICI-shardable engine. See SURVEY.md for the layer map.
"""

from . import constants

__version__ = "0.1.0"
