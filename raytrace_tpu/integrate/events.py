"""Event localization: stop conditions and in-step root refinement.

TPU-shaped replacement for DifferentialEquations.jl's ContinuousCallback
root-finding (reference: RayTrace_lat.jl:303-315 terminates at the Earth
surface crossing u[1] - re = 0). Detection is a sign change across an
accepted step; localization is bisection on the cubic Hermite interpolant
through (u0, du0, u1, du1) -- the endpoint derivatives are free because the
steppers are FSAL-structured. Fixed iteration count, no data-dependent
control flow: jit/vmap-safe.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

# per-ray status codes (carried in the scanned state so one bad ray cannot
# kill a batch; SURVEY.md section 5.3)
ACTIVE = 0
HIT_EARTH = 1          # r crossed the surface floor (terminal event)
MAX_PHASE_TIME = 2     # integration span exhausted (tspan end)
MAX_GROUP_TIME = 3     # group-delay budget exhausted
HIT_EQUATOR = 4        # magnetic-equator crossing (optional stop)
ESCAPED = 5            # r exceeded the outer ceiling
INVALID = 6            # non-finite state (the reference's DomainError class)
DT_UNDERFLOW = 7       # adaptive dt fell below dt_min
MAX_STEPS = 8          # step budget exhausted while still integrable --
                       # CVODE's maxsteps semantics (its solve warns at
                       # mxstep, RayMain.jl:387); a final result never
                       # reports ACTIVE. trace(carry0=...) resumes these
                       # rays (the status resets to ACTIVE on resume), so
                       # budget exhaustion stays non-terminal for
                       # checkpoint/restart and the rounds tracer.

EVANESCENT = 9         # group delay unwound past ZERO (T < 0 at a step
                       # end): the ray has spent more group time running
                       # backward than it ever propagated forward -- the
                       # abs(mu^2) evanescent-tracing regime the reference
                       # knowingly rides (sqrt(abs(mu^2)), RayMain.jl:264
                       # lineage; docs/NOTE_3D_GROUP_DELAY.md), not a
                       # propagating wave. The T < 0 criterion is
                       # stateless and robust: genuine MR rays take brief
                       # retrograde excursions at every mirror (measured:
                       # all of them trip a per-step dT < 0 test) but
                       # never unwind past launch. OPT-IN via
                       # StopSpec.stop_retrograde: the default keeps
                       # reference parity (the canonical off-shell 3D
                       # launch integrates retrograde from its first
                       # step, and the goldens pin it).

STATUS_NAMES = (
    "ACTIVE", "HIT_EARTH", "MAX_PHASE_TIME", "MAX_GROUP_TIME",
    "HIT_EQUATOR", "ESCAPED", "INVALID", "DT_UNDERFLOW", "MAX_STEPS",
    "EVANESCENT",
)


class StopSpec(NamedTuple):
    """Stop-condition thresholds (all floats; jittable pytree).

    Frames: index 0 is always r; `lat_sign`/`lat_offset` map state[1] to
    magnetic latitude (lat = lat_sign * state[1] + lat_offset), so the
    equator test works for both latitude (sign=+1, off=0) and colatitude
    (sign=-1, off=pi/2) frames."""

    r_floor: float = 1.0            # Earth surface, RE (u[0] - 1 = 0 event)
    r_ceil: float = jnp.inf         # escape radius, RE
    t_max: float = jnp.inf          # phase-path budget (scaled units)
    group_time_max: float = jnp.inf  # seconds
    stop_at_equator: float = 0.0    # 1.0 enables the equator stop
    lat_sign: float = 1.0
    lat_offset: float = 0.0
    stop_retrograde: float = 0.0    # 1.0 retires rays whose group delay
                                    # unwinds past ZERO as EVANESCENT
                                    # (the abs(mu^2) quirk regime; see
                                    # events.EVANESCENT for why T < 0 and
                                    # not per-step dT < 0). Default off:
                                    # bug-compatible with the reference,
                                    # which integrates straight through.


def hermite_interp(tau, u0, du0, u1, du1, dt):
    """Cubic Hermite interpolant on the step, tau in [0, 1]."""
    t2 = tau * tau
    t3 = t2 * tau
    h00 = 2.0 * t3 - 3.0 * t2 + 1.0
    h10 = t3 - 2.0 * t2 + tau
    h01 = -2.0 * t3 + 3.0 * t2
    h11 = t3 - t2
    return h00 * u0 + h10 * dt * du0 + h01 * u1 + h11 * dt * du1


def refine_crossing(value_of, u0, du0, u1, du1, dt, n_iter=32):
    """Bisection for tau where value_of(hermite(tau)) crosses zero.

    Assumes value_of(u0) and value_of(u1) have opposite signs (caller
    guarantees via the detection mask). Returns (tau, u_at_tau)."""
    sign0 = jnp.sign(value_of(u0))

    def body(_, ab):
        lo, hi = ab
        mid = 0.5 * (lo + hi)
        vm = value_of(hermite_interp(mid, u0, du0, u1, du1, dt))
        same = jnp.sign(vm) == sign0
        return jnp.where(same, mid, lo), jnp.where(same, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, n_iter, body, (jnp.zeros_like(dt), jnp.ones_like(dt))
    )
    tau = 0.5 * (lo + hi)
    return tau, hermite_interp(tau, u0, du0, u1, du1, dt)


def lat_of(u, spec: StopSpec):
    return spec.lat_sign * u[1] + spec.lat_offset


def classify_step(u0, u1, t1, spec: StopSpec, group_idx=3):
    """Status for a just-accepted step u0 -> u1 (0 if still active).

    group_idx: static index of the group-delay channel (3 for the 2D state,
    6 for the 3D state). Priority order matches the reference semantics:
    the terminal surface event wins (it is the only ContinuousCallback in
    the reference); other stops are discrete checks at step ends."""
    surface = u1[0] <= spec.r_floor
    equator = (
        (spec.stop_at_equator > 0.5)
        & (jnp.sign(lat_of(u1, spec)) != jnp.sign(lat_of(u0, spec)))
    )
    escaped = u1[0] >= spec.r_ceil
    group = u1[group_idx] >= spec.group_time_max
    phase = t1 >= spec.t_max
    invalid = ~jnp.all(jnp.isfinite(u1))
    retro = (spec.stop_retrograde > 0.5) & (u1[group_idx] < 0.0)
    status = jnp.where(phase, MAX_PHASE_TIME, ACTIVE)
    status = jnp.where(retro, EVANESCENT, status)
    status = jnp.where(group, MAX_GROUP_TIME, status)
    status = jnp.where(escaped, ESCAPED, status)
    status = jnp.where(equator, HIT_EQUATOR, status)
    status = jnp.where(surface, HIT_EARTH, status)
    status = jnp.where(invalid, INVALID, status)
    return status
