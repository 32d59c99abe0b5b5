"""Batched ray integration driver.

Replaces `ODEProblem` + `solve(..., CVODE_BDF(), callback=cb)` from the
reference (RayMain.jl:382-387, RayTrace_lat.jl:333-338) with a vmapped,
jit-compiled stepping loop:

  - every ray carries its own (t, dt, status, error-controller memory), so
    an adaptive batch diverges freely: rays hit the plasmapause knee or the
    Earth surface at different steps without host round-trips;
  - stop conditions are per-ray status codes, so one evanescent/NaN ray
    cannot kill a 10k-ray batch (SURVEY.md section 5.3);
  - final-state mode runs under lax.while_loop (early exit when every ray
    is done), trajectory mode under lax.scan with a fixed snapshot cadence
    (fixed shapes; mask-padded) -- the TPU-shaped version of the
    SavingCallback channel (RayTrace_lat.jl:318-330).

All tolerances follow the reference defaults: rtol 1e-7 (RayMain.jl:387),
dt_max = 1e6 m, dt_min = 1e-8 m (RayTrace_lat.jl:338), converted to scaled
(RE) units.
"""

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..constants import RE
from . import events
from .events import StopSpec
from .steppers import (
    bs3_step, dopri5_step, heun21_step, rk4_step, ros2_step, ros2x_step,
    ros3pr_step, ros4x_step,
)


class SolverConfig(NamedTuple):
    """Numeric solver knobs (jittable pytree)."""

    rtol: float = 1.0e-7
    atol: float = 1.0e-12
    dt0: float = 1.0e-4            # initial step, scaled units
    dt_min: float = 1.0e-12        # deliberate divergence from the
                                   # reference's dtmin = 1e-8 m == 1.6e-15
                                   # RE (RayTrace_lat.jl:338): that floor is
                                   # below any float's useful resolution and
                                   # lets rays wedged against dispersion
                                   # singularities (resonance-cone
                                   # crossings at low f / high lat) cycle
                                   # forever between no-op accepts at the
                                   # floor and rejection bursts ("Zeno
                                   # rays": measured 98% rejection, zero
                                   # progress, full budget burned). At
                                   # 1e-12 RE (~6 um of phase path) the
                                   # ray is flagged DT_UNDERFLOW instead --
                                   # the same step-size-failure semantics
                                   # CVODE reports at its own floor.
    dt_max: float = 1.0e6 / RE     # reference dtmax
    safety: float = 0.9
    pi_alpha: float = 0.7 / 5.0    # PI controller exponents (Hairer II.4)
    pi_beta: float = 0.4 / 5.0
    fac_min: float = 0.2
    fac_max: float = 5.0
    accept_tol: float = 1.0        # accept err <= accept_tol; > 1 trades a
                                   # bounded accuracy slack for fewer
                                   # borderline rejections (the controller
                                   # still *aims* at err ~ safety < 1)
    stall_dt_factor: float = 1.0e3  # device-side wedge retirement: an
                                    # ACCEPTED step with dt < stall_dt_factor
                                    # * dt_min is a "tiny" (no-op-scale)
                                    # accept; stall_count consecutive tiny
                                    # accepts (rejections in between do not
                                    # reset) flag the ray DT_UNDERFLOW. This
                                    # retires Zeno rays wedged on dispersion
                                    # singularities within ~100 attempts
                                    # instead of a full host round -- the
                                    # sawtooth (no-op accept at the floor,
                                    # capped regrowth, rejection burst) is
                                    # invisible to the error estimator but
                                    # perfectly visible in dt. 0 disables.
    stall_count: float = 64.0
    ds_max: float = 0.0            # arc-length step ceiling, scaled (RE)
                                   # units; 0 disables. The reference's
                                   # dtmax = 1e6 m (RayTrace_lat.jl:338)
                                   # caps PHASE path, but its physical job
                                   # is resolving spatial structure of the
                                   # medium -- and the spatial rate
                                   # |dx/dtau| ~ 1/mu varies ~100x along a
                                   # whistler ray, so a fixed phase ceiling
                                   # over-resolves space exactly where the
                                   # plasma is densest. ds_max caps the
                                   # ARC LENGTH per step instead, computed
                                   # from the FSAL carry k1 at zero extra
                                   # cost (see _arc_rate); dt_max remains
                                   # active as an outer bound (set it large
                                   # to run on the arc ceiling alone).
    ds_local_knee: float = 0.0     # > 0 enables the LOCAL arc ceiling and
                                   # gives the plasmapause L-shell (RE).
                                   # A single global ds_max must be sized
                                   # for the medium's sharpest feature
                                   # (the plasmapause knee), so it
                                   # over-resolves the smooth 90% of the
                                   # ray path. The local ceiling scales
                                   # with a gradient-length estimate of
                                   # the medium instead (_local_arc_cap):
                                   # tight only within ~ds_local_w of the
                                   # knee shell, opening to r/4.5 (the
                                   # L^-4.5 plasmasphere power law +
                                   # dipole field scale) elsewhere.
                                   # ds_max, when also > 0, stays as an
                                   # outer clamp; dt_max always does.
    ds_local_frac: float = 1.0     # ceiling = frac * gradient-length
                                   # estimate; the resolution knob.
    ds_local_w: float = 0.1        # knee smoothing width (RE): the
                                   # ceiling floor at the knee shell
                                   # itself (CA1992 transition scale,
                                   # ~6.4e5 m).
    ds_local_shells: tuple = ()    # extra sharp shells as static
                                   # ((L, width), ...) pairs -- e.g. a
                                   # field-aligned duct at duct_l0 is
                                   # exactly as sharp as the knee and
                                   # needs the same local tightening
                                   # (RunConfig.solver adds it when
                                   # duct_amp != 0). Unrolled at trace
                                   # time (a Python tuple, not traced).


class RayCarry(NamedTuple):
    """Per-ray integration state threaded through the scan.

    u_prev/dt_prev snapshot the step on which a terminal event fired, so
    event localization (bisection on the Hermite interpolant) runs ONCE per
    ray in a post-pass instead of 2 x 32 serialized iterations inside every
    hot-loop step -- the single biggest step-cost win on TPU."""

    u: jnp.ndarray         # state vector (n,)
    t: jnp.ndarray         # phase path, scaled units
    dt: jnp.ndarray        # current step size
    k1: jnp.ndarray        # du/dt at (t, u)   [FSAL carry]
    errold: jnp.ndarray    # controller memory
    status: jnp.ndarray    # events.* status code, int32
    n_accept: jnp.ndarray  # int32
    n_reject: jnp.ndarray  # int32
    u_prev: jnp.ndarray    # state at the start of the terminating step
    dt_prev: jnp.ndarray   # size of the terminating step
    u_lo: jnp.ndarray      # compensated-summation residual of u: the true
                           # state is u + u_lo to ~2x working precision.
                           # In float32 this removes the dominant
                           # trajectory error (state-update rounding
                           # random-walks past 1e-4 over ~1e4 steps
                           # otherwise); in float64 it is harmless noise.
    rejected: jnp.ndarray  # 1 if the previous attempt was rejected: the
                           # controller then caps the next growth factor
                           # at 1 (Hairer II.4), which stops accept/reject
                           # thrash in stiff regions like the plasmapause
                           # knee (measured 77% rejection rate there
                           # without it).
    n_tiny: jnp.ndarray    # consecutive tiny-accept counter (int32) for
                           # the device-side wedge retirement (see
                           # SolverConfig.stall_dt_factor); reset by any
                           # normal-sized accepted step.
    caution: jnp.ndarray   # rejection-burst memory (int32): +4 per
                           # rejection, -1 per acceptance, clamped to
                           # [0, 60]. While > 8, post-accept dt regrowth
                           # is capped at 1.3x instead of fac_max -- the
                           # CVODE eta-limiting semantics after repeated
                           # error failures. Near whistler reflection
                           # points the error spike recurs every few
                           # steps; uncapped 5x regrowth re-overshoots it
                           # each time (measured 34-77% rejection), while
                           # the cautious cap tracks the spike at ~0 extra
                           # cost and no method switch.


class TraceResult(NamedTuple):
    u: jnp.ndarray          # (B, n) final states
    t: jnp.ndarray          # (B,) final phase path
    status: jnp.ndarray     # (B,) status codes
    n_accept: jnp.ndarray   # (B,)
    n_reject: jnp.ndarray   # (B,)
    traj: Optional[Any] = None  # dict of stacked snapshots (traj mode)
    carry: Optional[Any] = None  # full RayCarry batch (for checkpoint/resume)


def init_carry(rhs_fn, u0, f, cfg: SolverConfig):
    """Initial carry for one ray; u0 shape (n,)."""
    dtype = u0.dtype
    return RayCarry(
        u=u0,
        t=jnp.zeros((), dtype),
        dt=jnp.asarray(cfg.dt0, dtype),
        k1=rhs_fn(u0, f),
        errold=jnp.asarray(1.0e-4, dtype),
        status=jnp.zeros((), jnp.int32),
        n_accept=jnp.zeros((), jnp.int32),
        n_reject=jnp.zeros((), jnp.int32),
        u_prev=u0,
        dt_prev=jnp.asarray(cfg.dt0, dtype),
        u_lo=jnp.zeros_like(u0),
        rejected=jnp.zeros((), jnp.int32),
        n_tiny=jnp.zeros((), jnp.int32),
        caution=jnp.zeros((), jnp.int32),
    )


def _sel(cond, a, b):
    """jnp.where with a scalar-per-ray condition over a state vector.

    Broadcasts the mask through int32 instead of i1: Mosaic cannot insert
    a minor dim on 1-bit vectors ("reshape i1 (B,) -> (B,1)"), so the
    straightforward where() fails to lower inside the Pallas kernel."""
    m = jnp.broadcast_to(cond.astype(jnp.int32), a.shape) > 0
    return jnp.where(m, a, b)


def _local_arc_ceiling(u, spec: StopSpec, cfg: SolverConfig):
    """Arc-length ceiling from a local medium gradient-length estimate.

    Two scales, take the smaller:
      - smooth plasmasphere: density ~ L^-4.5 and dipole |B| ~ r^-3 give a
        logarithmic gradient length ~ r/4.5;
      - sharp shells (the plasmapause knee, plus any ds_local_shells such
        as a density duct): a shell at L spans r = L cos^2(mlat), so
        |r - L cos^2(mlat)| is the radial distance to it at the ray's own
        latitude, floored by the shell's transition width.
    Scaled by ds_local_frac. Magnetic latitude comes from the same
    lat_sign/lat_offset frame map the event system uses (events.lat_of);
    for tilted/IGRF 3D media this is the geographic approximation -- fine
    for a step CEILING (the error estimator still owns accuracy).
    """
    r = u[0]
    g = r * (1.0 / 4.5)
    c = jnp.cos(events.lat_of(u, spec))
    c2 = c * c
    shells = ((cfg.ds_local_knee, cfg.ds_local_w),) + tuple(
        cfg.ds_local_shells
    )
    for shell_l, shell_w in shells:
        g = jnp.minimum(g, shell_w + jnp.abs(r - shell_l * c2))
    return cfg.ds_local_frac * g


def _arc_rate(u, k1):
    """Spatial speed ds/dtau of the ray from the FSAL derivative carry.

    Spherical line element: ds^2 = dr^2 + (r dlat)^2 for the 4-state 2D
    frames (u = [r, lat-or-colat, chi, T]) plus (r sin(theta) dphi)^2 for
    the 7-state 3D frame (u = [r, theta, phi, rho, T]); k1 holds the
    corresponding rates, so this is free per attempt."""
    r = u[0]
    s2 = k1[0] * k1[0] + (r * k1[1]) * (r * k1[1])
    if u.shape[0] >= 7:
        vp = r * jnp.sin(u[1]) * k1[2]
        s2 = s2 + vp * vp
    return jnp.sqrt(s2)


def _step_one(rhs_fn, carry: RayCarry, f, cfg: SolverConfig, spec: StopSpec,
              group_idx: int, adaptive: bool, stepper: str = "dopri5"):
    """One attempted step for one ray; no-op when the ray is not ACTIVE.

    stepper: "dopri5" (adaptive explicit, default) | "bs3" (adaptive
    explicit 3(2), half the stage cost per attempt) | "heun2" (adaptive
    explicit 2(1), the cheapest rung -- coarse tolerances only) |
    "ros2" / "ros2x" / "ros3pr" / "ros4x" (adaptive linearly implicit
    L-stable, orders 2 / 3 / 3 / 4 -- the stiff tier; ros3pr is the
    stage-order-aware scheme with no Prothero-Robinson order reduction,
    at about half a ros2x attempt's cost) | "rk4" (fixed step, selected
    by adaptive=False).
    Controller exponents scale with the stepper's order."""
    active = carry.status == events.ACTIVE
    rhs1 = lambda u: rhs_fn(u, f)
    # step ceiling (adaptive only -- fixed-step rk4 honors dt0 exactly):
    # reference phase-path dtmax, optionally tightened (or in practice
    # mostly LOOSENED, since mu > 1 for whistlers) by the arc-length
    # ceiling ds_max / (ds/dtau) -- see SolverConfig.ds_max
    # static elision: cfg fields are Python floats in every production
    # path (SolverConfig is closed over by the jitted tracer, never
    # traced), so gate at trace time and keep the arc-rate sqrt chain
    # out of the compiled hot loop entirely for ds_max == 0 workloads
    # rather than trusting dead-branch folding; a traced ds_max still
    # works via the jnp.where.
    ds_static = isinstance(cfg.ds_max, (int, float))
    local_static = isinstance(cfg.ds_local_knee, (int, float))
    local_on = (not local_static) or cfg.ds_local_knee > 0.0
    if adaptive and ds_static and cfg.ds_max <= 0.0 and not local_on:
        dt_cap = jnp.asarray(cfg.dt_max, carry.dt.dtype)
        dt_eff = jnp.minimum(carry.dt, dt_cap)
    elif adaptive:
        if local_on:
            ds_eff = _local_arc_ceiling(carry.u, spec, cfg)
            if not local_static:
                ds_eff = jnp.where(
                    jnp.asarray(cfg.ds_local_knee) > 0.0, ds_eff,
                    jnp.asarray(jnp.inf, carry.dt.dtype),
                )
            if ds_static:
                if cfg.ds_max > 0.0:
                    ds_eff = jnp.minimum(ds_eff, cfg.ds_max)
            else:
                ds_eff = jnp.where(
                    jnp.asarray(cfg.ds_max) > 0.0,
                    jnp.minimum(ds_eff, cfg.ds_max), ds_eff,
                )
        else:
            ds_eff = jnp.asarray(cfg.ds_max, carry.dt.dtype)
            if not ds_static:
                ds_eff = jnp.where(
                    jnp.asarray(cfg.ds_max) > 0.0, ds_eff,
                    jnp.asarray(jnp.inf, carry.dt.dtype),
                )
        arc_cap = jnp.maximum(
            ds_eff / jnp.maximum(_arc_rate(carry.u, carry.k1), 1e-30),
            cfg.dt_min,
        )
        dt_cap = jnp.minimum(jnp.asarray(cfg.dt_max, carry.dt.dtype), arc_cap)
        dt_eff = jnp.minimum(carry.dt, dt_cap)
    else:
        dt_eff = carry.dt
    # do not overshoot the phase-path budget (CVODE integrates to tstop)
    dt_eff = jnp.minimum(
        dt_eff, jnp.maximum(spec.t_max - carry.t, cfg.dt_min)
    )

    order = 5.0
    if not adaptive:
        out = rk4_step(rhs1, carry.u, carry.k1, dt_eff)
        accept = jnp.asarray(True)
    elif stepper == "ros2":
        order = 2.0
        out = ros2_step(rhs1, carry.u, carry.k1, dt_eff, cfg.rtol, cfg.atol)
        accept = out.err <= cfg.accept_tol
    elif stepper == "ros2x":
        order = 3.0
        out = ros2x_step(rhs1, carry.u, carry.k1, dt_eff, cfg.rtol, cfg.atol)
        accept = out.err <= cfg.accept_tol
    elif stepper == "ros3pr":
        order = 3.0
        out = ros3pr_step(rhs1, carry.u, carry.k1, dt_eff, cfg.rtol, cfg.atol)
        accept = out.err <= cfg.accept_tol
    elif stepper == "ros4x":
        order = 4.0
        out = ros4x_step(rhs1, carry.u, carry.k1, dt_eff, cfg.rtol, cfg.atol)
        accept = out.err <= cfg.accept_tol
    elif stepper == "bs3":
        order = 3.0
        out = bs3_step(rhs1, carry.u, carry.k1, dt_eff, cfg.rtol, cfg.atol)
        accept = out.err <= cfg.accept_tol
    elif stepper == "heun2":
        order = 2.0
        out = heun21_step(rhs1, carry.u, carry.k1, dt_eff, cfg.rtol, cfg.atol)
        accept = out.err <= cfg.accept_tol
    else:
        if stepper != "dopri5":
            raise ValueError(f"unknown stepper {stepper!r}")
        out = dopri5_step(rhs1, carry.u, carry.k1, dt_eff, cfg.rtol, cfg.atol)
        accept = out.err <= cfg.accept_tol

    t1 = carry.t + dt_eff
    status1 = events.classify_step(carry.u, out.u_new, t1, spec, group_idx)
    if adaptive:
        # stall detection: an ACCEPTED step at the dt floor is a no-op in
        # working precision (the increment vanishes, so the local error
        # estimator is blind to the wedge) -- rays pinned against
        # dispersion singularities would otherwise cycle forever between
        # no-op accepts and rejection bursts. Flag them DT_UNDERFLOW
        # unless a real stop already fired this step.
        stalled = (status1 == events.ACTIVE) & (
            dt_eff <= cfg.dt_min * 2.0
        )
        status1 = jnp.where(stalled, events.DT_UNDERFLOW, status1)
    # terminal-crossing localization is deferred to refine_events() after
    # the loop; here we only snapshot the terminating step's start state
    terminal = (status1 == events.HIT_EARTH) | (status1 == events.HIT_EQUATOR)
    u_fin = out.u_new
    t_fin = t1

    # PI step-size controller (powers as exp/log: Pallas-lowerable, and
    # err > 0 is guaranteed by the floor)
    if adaptive:
        # a non-finite error estimate (RHS hit a dispersion singularity in
        # some stage) must act as a hard rejection, NOT poison the
        # controller: log(nan) would make dt nan and the ray would then
        # reject forever without ever tripping the dt_min underflow check
        # (measured: wedged 500 Hz f32 rays spinning 4000+ rejections with
        # dt = nan). Substituting a huge err makes fac_rej take the 0.05x
        # floor, so dt collapses to dt_min within ~5 attempts and the ray
        # retires as DT_UNDERFLOW -- CVODE's repeated-err-failure path.
        err = jnp.where(
            jnp.isfinite(out.err), jnp.maximum(out.err, 1.0e-10), 1.0e10
        )
        log_err = jnp.log(err)
        scale5 = 5.0 / order  # PI exponents tuned per stepper order
        fac_cap = jnp.where(
            carry.rejected > 0, 1.0,
            jnp.where(carry.caution > 8, 1.3, cfg.fac_max),
        )
        fac_acc = jnp.clip(
            cfg.safety
            * jnp.exp(scale5 * (-cfg.pi_alpha * log_err
                                + cfg.pi_beta * jnp.log(carry.errold))),
            cfg.fac_min, fac_cap,
        )
        # rejections may need a much sharper cut than the accept-side
        # fac_min: error spikes at whistler reflection points are orders
        # of magnitude, and crawling down at 0.2x per reject wastes 3-4
        # attempts per spike (measured 33% rejection on the headline
        # ensemble with the conservative clamp)
        fac_rej = jnp.clip(
            cfg.safety * jnp.exp(-log_err / order), 0.05, 1.0
        )
        dt_next = jnp.clip(
            dt_eff * jnp.where(accept, fac_acc, fac_rej),
            cfg.dt_min, dt_cap,
        )
        underflow = (~accept) & (dt_eff <= cfg.dt_min * (1.0 + 1.0e-6))
        errold_new = jnp.where(accept, jnp.maximum(err, 1.0e-4), carry.errold)
    else:
        dt_next = carry.dt
        underflow = jnp.asarray(False)
        errold_new = carry.errold

    adv = active & accept
    status_new = jnp.where(
        active,
        jnp.where(
            accept, status1,
            jnp.where(underflow, events.DT_UNDERFLOW, events.ACTIVE),
        ),
        carry.status,
    ).astype(jnp.int32)

    # device-side wedge retirement (see SolverConfig.stall_dt_factor)
    if adaptive:
        tiny = (dt_eff < cfg.dt_min * cfg.stall_dt_factor) & (
            cfg.stall_dt_factor > 0
        )
        n_tiny_new = jnp.where(
            adv,
            jnp.where(tiny, carry.n_tiny + 1, jnp.zeros_like(carry.n_tiny)),
            carry.n_tiny,
        ).astype(jnp.int32)
        wedged = (
            adv & (n_tiny_new >= cfg.stall_count)
            & (status_new == events.ACTIVE)
        )
        status_new = jnp.where(
            wedged, events.DT_UNDERFLOW, status_new
        ).astype(jnp.int32)
    else:
        n_tiny_new = carry.n_tiny

    # compensated state update (fast two-sum: |u| >> |increment| holds
    # for every state component at our step sizes)
    d = out.incr + carry.u_lo
    u_comp = carry.u + d
    u_lo_new = d - (u_comp - carry.u)

    snap = adv & terminal
    return RayCarry(
        u=_sel(adv, u_comp, carry.u),
        t=jnp.where(adv, t_fin, carry.t),
        dt=jnp.where(active, dt_next, carry.dt),
        k1=_sel(adv, out.k_end, carry.k1),
        errold=jnp.where(active, errold_new, carry.errold),
        status=status_new,
        n_accept=carry.n_accept + adv.astype(jnp.int32),
        n_reject=carry.n_reject + (active & ~accept).astype(jnp.int32),
        u_prev=_sel(snap, carry.u, carry.u_prev),
        dt_prev=jnp.where(snap, dt_eff, carry.dt_prev),
        u_lo=_sel(adv, u_lo_new, carry.u_lo),
        rejected=jnp.where(
            active, (~accept).astype(jnp.int32), carry.rejected
        ),
        n_tiny=n_tiny_new,
        caution=jnp.where(
            active,
            jnp.clip(
                carry.caution + jnp.where(accept, -1, 4).astype(jnp.int32),
                0, 60,
            ),
            carry.caution,
        ).astype(jnp.int32),
    )


def refine_events(rhs_fn, carry: RayCarry, f, spec: StopSpec):
    """One-shot post-pass event localization for a single ray.

    For rays that ended on HIT_EARTH / HIT_EQUATOR, bisect the cubic
    Hermite interpolant of the snapshotted terminating step. Endpoint
    derivatives: k0 = rhs(u_prev) (one extra eval, once per ray), k1 is
    the FSAL carry (= rhs at the unrefined end state)."""
    is_surf = carry.status == events.HIT_EARTH
    is_eq = carry.status == events.HIT_EQUATOR
    k0 = rhs_fn(carry.u_prev, f)
    tau_s, u_s = events.refine_crossing(
        lambda uu: uu[0] - spec.r_floor,
        carry.u_prev, k0, carry.u, carry.k1, carry.dt_prev,
    )
    tau_e, u_e = events.refine_crossing(
        lambda uu: events.lat_of(uu, spec),
        carry.u_prev, k0, carry.u, carry.k1, carry.dt_prev,
    )
    u_fin = _sel(is_surf, u_s, _sel(is_eq, u_e, carry.u))
    tau = jnp.where(is_surf, tau_s, jnp.where(is_eq, tau_e, 1.0))
    t_fin = carry.t - (1.0 - tau) * carry.dt_prev
    return carry._replace(u=u_fin, t=t_fin)


def trace(
    rhs_fn,
    u0,
    f,
    *,
    cfg: SolverConfig = SolverConfig(),
    spec: StopSpec = StopSpec(),
    group_idx: int = 3,
    adaptive: bool = True,
    stepper: str = "dopri5",
    max_steps: int = 20000,
    save_every: int = 0,
    save_fn=None,
    chunk: int = 64,
    carry0: Optional[RayCarry] = None,
):
    """Integrate a batch of rays. u0: (B, n); f: (B,) frequencies in Hz.

    save_every == 0: final states only, early-exits via lax.while_loop when
    every ray has terminated (checked every `chunk` attempted steps).
    save_every > 0: records a snapshot of (u, t, status) -- plus
    save_fn(u, f) extras, e.g. the (mu, dmu/dpsi, dip, psi) diagnostics of
    the reference SavingCallback -- every save_every attempted steps, under
    lax.scan with fixed shapes.

    carry0: resume from a previously checkpointed RayCarry batch instead of
    initializing from (u0, f) (SURVEY.md section 5.4 -- the integrator is
    deterministic, so resume is exact).
    """
    step = partial(
        _step_one, rhs_fn, cfg=cfg, spec=spec,
        group_idx=group_idx, adaptive=adaptive, stepper=stepper,
    )
    step_b = jax.vmap(step)
    if carry0 is None:
        carry0 = jax.vmap(lambda u, ff: init_carry(rhs_fn, u, ff, cfg))(u0, f)
    else:
        # MAX_STEPS means "budget ran out, still integrable": resuming
        # from a checkpointed carry re-activates exactly those rays, so
        # budget exhaustion composes transparently with checkpoint/resume
        # and with the rounds tracer's per-round trace calls.
        carry0 = carry0._replace(
            status=jnp.where(
                carry0.status == events.MAX_STEPS, events.ACTIVE,
                carry0.status,
            ).astype(jnp.int32)
        )

    if save_every == 0:
        n_chunks = -(-max_steps // chunk)

        def cond(state):
            i, c = state
            return (i < n_chunks) & jnp.any(c.status == events.ACTIVE)

        def body(state):
            i, c = state
            c = jax.lax.fori_loop(0, chunk, lambda _, cc: step_b(cc, f), c)
            return i + 1, c

        _, carry = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), carry0))
        traj = None
    else:
        n_outer = -(-max_steps // save_every)

        def outer(c, _):
            c = jax.lax.fori_loop(0, save_every, lambda _, cc: step_b(cc, f), c)
            snap = {"u": c.u, "t": c.t, "status": c.status}
            if save_fn is not None:
                snap["extras"] = jax.vmap(save_fn)(c.u, f)
            return c, snap

        carry, traj = jax.lax.scan(outer, carry0, None, length=n_outer)

    # rays alive at budget exhaustion report MAX_STEPS, never ACTIVE
    # (CVODE's maxsteps semantics); trace(carry0=...) resumes them.
    carry = carry._replace(
        status=jnp.where(
            carry.status == events.ACTIVE, events.MAX_STEPS, carry.status
        ).astype(jnp.int32)
    )
    carry = jax.vmap(lambda c, ff: refine_events(rhs_fn, c, ff, spec))(carry, f)
    return TraceResult(
        u=carry.u, t=carry.t, status=carry.status,
        n_accept=carry.n_accept, n_reject=carry.n_reject, traj=traj,
        carry=carry,
    )
