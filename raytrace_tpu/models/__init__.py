"""Environment (medium) models: dipole B-field, ionosphere, plasmasphere."""

from . import dipole, ionosphere, plasmasphere, storm
from .medium import (
    EnvParams,
    b_mag,
    cast_env,
    make_env,
    make_env_lat,
    make_env_raymain,
    ne_total_m3,
)

__all__ = [
    "EnvParams",
    "b_mag",
    "cast_env",
    "dipole",
    "ionosphere",
    "make_env",
    "make_env_lat",
    "make_env_raymain",
    "ne_total_m3",
    "plasmasphere",
    "storm",
]
