"""Checkpoint/resume for long ensemble integrations.

The reference has nothing here (runs live in the REPL; SURVEY.md section
5.4). On TPU the realistic failure mode is preemption, so the full
per-ray integration carry (state, t, dt, FSAL derivative, controller
memory, status, step counters) is saved to a .npz and resume is *exact*:
the integrator is deterministic and carries no RNG.
"""

import numpy as np

from ..integrate.solve import RayCarry

CARRY_FIELDS = RayCarry._fields


def save_carry(path, carry: RayCarry, step: int = 0, meta: dict | None = None):
    """Save a (batched) RayCarry to `path` (.npz)."""
    arrays = {k: np.asarray(getattr(carry, k)) for k in CARRY_FIELDS}
    arrays["__step__"] = np.asarray(step)
    if meta:
        for k, v in meta.items():
            arrays[f"__meta_{k}__"] = np.asarray(v)
    np.savez(path, **arrays)


def load_carry(path):
    """Load (carry, step, meta) from a checkpoint written by save_carry."""
    with np.load(path) as z:
        carry = RayCarry(*[z[k] for k in CARRY_FIELDS])
        step = int(z["__step__"])
        meta = {
            k[len("__meta_"):-2]: z[k]
            for k in z.files
            if k.startswith("__meta_")
        }
    return carry, step, meta
