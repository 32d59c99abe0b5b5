"""Launch grids and ICI-sharded ensemble tracing.

The reference only ever *planned* ensembles ("loop over initial
frequencies", design sketch RayMain.jl:32-52); its one vectorized call is a
Julia broadcast over a psi sweep (RayTrace_lat.jl:395). Here the ensemble
is first-class: a LaunchSpec builds the (latitude x wave-normal angle x
frequency) cartesian grid, the batch is padded to the mesh, sharded over
the 'rays' ICI axis, and traced in one jit. Ensemble statistics are jnp
reductions on the sharded result -- XLA inserts the ICI collectives.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import RE
from ..integrate import SolverConfig, StopSpec, events, trace
from ..integrate.solve import TraceResult
from ..models import medium
from ..ops import rhs as rhs_mod
from . import mesh as mesh_mod

# status code used for padding lanes (distinct from every events.* code)
PAD_STATUS = 100


class LaunchSpec(NamedTuple):
    """Host-side launch grid: rays at every (lat0, chi0, freq) combination.

    Mirrors the canonical ICs (RayTrace_lat.jl:333: r0 = RE + 1000 km,
    lat0 = pi/4, chi0 = 0, f = 1000 Hz) generalized to a fan."""

    r0: float = (RE + 1.0e6) / RE
    lats: tuple = (np.pi / 4,)
    chis: tuple = (0.0,)
    freqs: tuple = (1000.0,)


def build_launch(spec: LaunchSpec, dtype=np.float32):
    """(u0 (N,4), f (N,)) for the 2D latitude-frame state."""
    lat, chi, fr = np.meshgrid(
        np.asarray(spec.lats, np.float64),
        np.asarray(spec.chis, np.float64),
        np.asarray(spec.freqs, np.float64),
        indexing="ij",
    )
    n = lat.size
    u0 = np.zeros((n, 4), dtype)
    u0[:, 0] = spec.r0
    u0[:, 1] = lat.ravel()
    u0[:, 2] = chi.ravel()
    return u0, fr.ravel().astype(dtype)


def pad_batch(u0, f, mesh, multiple=8):
    """Pad (u0, f) to the mesh-friendly size; returns (u0, f, valid_mask).

    Padding rays copy ray 0's state (guaranteed-valid physics) and are
    excluded from statistics via the mask."""
    n = u0.shape[0]
    n_pad = mesh_mod.pad_rays(n, mesh, multiple)
    if n_pad != n:
        u0 = np.concatenate([u0, np.repeat(u0[:1], n_pad - n, axis=0)])
        f = np.concatenate([f, np.repeat(f[:1], n_pad - n)])
    valid = np.arange(n_pad) < n
    return u0, f, valid


def make_ensemble_tracer(
    env: medium.EnvParams,
    *,
    frame="2d_lat",
    cfg: SolverConfig = SolverConfig(),
    spec: StopSpec = StopSpec(),
    adaptive: bool = True,
    stepper: str = "dopri5",
    max_steps: int = 20000,
    chunk: int = 64,
    mesh=None,
    grad_mode="fused",
    root=1.0,
):
    """Jitted (u0, f) -> TraceResult over the ray batch.

    frame: '2d_lat' | '2d_colat' | '3d'. With a mesh, inputs/outputs are
    sharded over the 'rays' axis (ICI data parallelism)."""
    if frame == "2d_lat":
        rhs_fn = lambda u, ff: rhs_mod.rhs_2d_lat(
            u, ff, env, grad_mode=grad_mode, root=root)
        group_idx = 3
    elif frame == "2d_colat":
        rhs_fn = lambda u, ff: rhs_mod.rhs_2d_colat(
            u, ff, env, grad_mode=grad_mode, root=root)
        group_idx = 3
    elif frame == "3d":
        rhs_fn = lambda u, ff: rhs_mod.rhs_3d(u, ff, env, root=root)
        group_idx = 6
    else:
        raise ValueError(f"unknown frame {frame!r}")

    def run(u0, f):
        return trace(
            rhs_fn, u0, f, cfg=cfg, spec=spec, group_idx=group_idx,
            adaptive=adaptive, stepper=stepper, max_steps=max_steps,
            chunk=chunk,
        )

    if mesh is not None:
        sh = mesh_mod.ray_sharding(mesh)
        return jax.jit(run, in_shardings=(sh, sh))
    return jax.jit(run)


def _bucket_size(n_active, n_full, floor):
    """Smallest power-of-two multiple of `floor` that holds n_active."""
    b = floor
    while b < n_active:
        b *= 2
    return min(b, n_full)


def make_rounds_tracer(
    env: medium.EnvParams,
    *,
    mesh=None,
    frame="2d_lat",
    cfg: SolverConfig = SolverConfig(),
    spec: StopSpec = StopSpec(),
    adaptive: bool = True,
    stepper: str = "auto",
    max_steps: int = 20000,
    round_steps=4096,
    chunk: int = 256,
    grad_mode="fused",
    root=1.0,
    bucket_floor: int = 1024,
    stall_progress: float = 1.0e-3,
    stiff_switch: float = 0.5,
    stiff_unswitch: float = 0.02,
):
    """Ensemble tracer with host-side bucketed re-batching.

    stepper="auto" (default) is the CVODE-style automatic method choice,
    at round granularity: every ray starts on explicit DP5; a ray whose
    rejection fraction over a round exceeds `stiff_switch` (the
    rejection-burst signature of stiff dynamics at whistler reflection
    points / the plasmapause knee -- measured 77% there) is re-bucketed
    into a stiff pool integrated with ros2x (L-stable order-3 Rosenbrock),
    and returns to DP5 when its round rejection falls below
    `stiff_unswitch`. Pools are separate compiled programs over the same
    RayCarry, so the switch is exact (dt/controller state carry over) and
    costs nothing per step -- a per-step lax.cond would execute BOTH
    steppers on every lane under vmap. Explicit "dopri5"/"ros2"/"ros2x"
    pin the method for every ray.

    stall_progress: rays whose phase path advanced less than this (RE)
    over a whole round are marked DT_UNDERFLOW and dropped. Rays wedged
    against dispersion singularities (resonance-cone crossings at low
    f/high lat) otherwise saw-tooth forever -- tiny real accepts, 5x dt
    regrowth, rejection burst -- accepting ~1% of attempts with ~zero
    progress (measured 98% rejection on the worst 500 Hz rays). This is
    the step-size-failure semantics CVODE reports at its dtmin. 0
    disables.

    A single fixed-shape while_loop pays for the slowest ray across every
    lane (measured lane utilization ~0.17 on the canonical 10k fan, where
    the median ray needs ~1.7k steps but stragglers need 20k+). Instead:
    integrate in rounds of `round_steps`; after each round, gather the
    still-active rays, re-pad to the next power-of-two bucket, and
    continue from their exact RayCarry (bitwise-identical to the
    uninterrupted run -- the carry holds dt, controller memory and FSAL
    derivative). The returned `run(u0, f, valid)` holds its jitted
    start/continue programs, compiled once per bucket size and reused
    across rounds and calls."""
    if frame == "2d_lat":
        rhs_fn = lambda u, ff: rhs_mod.rhs_2d_lat(
            u, ff, env, grad_mode=grad_mode, root=root)
        group_idx = 3
    elif frame == "2d_colat":
        rhs_fn = lambda u, ff: rhs_mod.rhs_2d_colat(
            u, ff, env, grad_mode=grad_mode, root=root)
        group_idx = 3
    elif frame == "3d":
        rhs_fn = lambda u, ff: rhs_mod.rhs_3d(u, ff, env, root=root)
        group_idx = 6
    else:
        raise ValueError(f"unknown frame {frame!r}")

    # round_steps: int (uniform) or a schedule tuple -- short early rounds
    # retire the fast majority cheaply, long late rounds amortize per-round
    # overhead for the stragglers; the last entry repeats.
    schedule = (
        tuple(round_steps) if isinstance(round_steps, (tuple, list))
        else (int(round_steps),)
    )

    auto = stepper == "auto"
    base_stepper = "dopri5" if auto else stepper

    def make_kw(n, st):
        return dict(
            cfg=cfg, spec=spec, group_idx=group_idx, adaptive=adaptive,
            stepper=st, max_steps=n, chunk=min(chunk, n),
        )

    @partial(jax.jit, static_argnums=2)
    def start(u, ff, n):
        return trace(rhs_fn, u, ff, **make_kw(n, base_stepper))

    @partial(jax.jit, static_argnums=(2, 3))
    def cont(carry, ff, n, st):
        return trace(rhs_fn, carry.u, ff, carry0=carry, **make_kw(n, st))

    # small buckets are latency-bound on TPU (10k lanes ~ 80 VPU tiles
    # already borderline); keep at least bucket_floor lanes per round
    floor = max((mesh.devices.size if mesh is not None else 1) * 8,
                bucket_floor)

    def round_len(i):
        return schedule[min(i, len(schedule) - 1)]

    def run(u0, f, valid):
        n = u0.shape[0]
        f_np = np.asarray(f)
        first = min(round_len(0), max_steps)
        res = start(jnp.asarray(u0), jnp.asarray(f), first)
        final = jax.tree.map(lambda a: np.asarray(a).copy(), res.carry)

        # per-ray stiff flag (auto mode): rejection burst -> ros2x pool.
        # Switching is gated on PROGRESS: a bursting ray that also made no
        # phase-path progress is a Zeno ray wedged on a dispersion
        # singularity -- not stiff-solvable; it gets DT_UNDERFLOW from the
        # stall check instead of an (expensive) ros2x round. Measured:
        # ungated switching sent the headline ensemble's wedged rays
        # through ros2x rounds at ~9x per-attempt cost for zero resolution
        # (13.7 s vs ~3 s wall on the 10k bench).
        stiff = np.zeros(n, bool)

        def settle(idx, rf, prog, st):
            """Post-round bookkeeping for the rays in idx: stall
            retirement first, then stiff-pool membership updates."""
            still = final.status[idx] == events.ACTIVE
            if stall_progress > 0.0:
                stalled = still & (prog < stall_progress)
                final.status[idx[stalled]] = events.DT_UNDERFLOW
                still = still & ~stalled
            if auto and st == "ros2x":
                stiff[idx[still & (rf < stiff_unswitch)]] = False
            elif auto:
                stiff[idx[still & (rf > stiff_switch)]] = True

        def advance(idx, st, nr):
            """One round for the index set idx with stepper st; returns the
            per-ray (rejection fraction, phase-path progress) over it."""
            b = _bucket_size(idx.size, n, floor)
            sel = np.concatenate([idx, np.repeat(idx[:1], b - idx.size)])
            sub = jax.tree.map(lambda a: jnp.asarray(a[sel]), final)
            rej0 = final.n_reject[idx].copy()
            acc0 = final.n_accept[idx].copy()
            t0 = final.t[idx].copy()
            r = cont(sub, jnp.asarray(f_np[sel]), nr, st)
            sub_new = jax.tree.map(np.asarray, r.carry)
            take = np.arange(idx.size)
            for name in final._fields:
                getattr(final, name)[idx] = getattr(sub_new, name)[take]
            att = (final.n_accept[idx] - acc0) + (final.n_reject[idx] - rej0)
            rf = (final.n_reject[idx] - rej0) / np.maximum(att, 1)
            return rf, final.t[idx] - t0

        # round-1 bookkeeping (the start program ran all rays on the base
        # stepper from t = 0)
        idx0 = np.nonzero(np.asarray(valid))[0]
        att0 = (final.n_accept + final.n_reject)[idx0]
        rf0 = final.n_reject[idx0] / np.maximum(att0, 1)
        settle(idx0, rf0, final.t[idx0], base_stepper)

        steps_done = first
        i = 1
        while steps_done < max_steps:
            active = (final.status == events.ACTIVE) & np.asarray(valid)
            if not active.any():
                break
            nr = min(round_len(i), max_steps - steps_done)
            pools = (
                ((~stiff, base_stepper), (stiff, "ros2x")) if auto
                else ((np.ones(n, bool), base_stepper),)
            )
            for mask, st in pools:
                idx = np.nonzero(active & mask)[0]
                if idx.size == 0:
                    continue
                # the stiff pool runs short rounds: an L-stable method
                # covers the same span in far fewer steps, and rays that
                # turn out to be wedged on a singularity (both methods
                # reject everything) reach the stall check after at most
                # 1024 wasted attempts instead of a full dp5-length round
                nr_pool = min(nr, 1024) if st == "ros2x" else nr
                rf, prog = advance(idx, st, nr_pool)
                settle(idx, rf, prog, st)
            steps_done += nr
            i += 1

        run.last_stiff = stiff  # which rays ended on the ros2x pool
        return TraceResult(
            u=final.u, t=final.t, status=final.status,
            n_accept=final.n_accept, n_reject=final.n_reject,
            traj=None, carry=final,
        )

    run.last_stiff = None
    return run


def ensemble_stats(result, valid, lat_sign=1.0, lat_offset=0.0):
    """Summary statistics over a traced ensemble (jnp; collective-safe).

    Returns a dict of scalars: per-status counts, mean/max group delay and
    landing L-shell among surface hits, total accepted steps.

    lat_sign/lat_offset map state[1] to magnetic latitude (the StopSpec
    convention): (+1, 0) for the latitude frame, (-1, pi/2) for the
    colatitude frames (2d_colat and 3d), where state[1] is colatitude
    theta and L = r / cos^2(lat) = r / sin^2(theta)."""
    valid = jnp.asarray(valid)
    status = jnp.where(valid, result.status, PAD_STATUS)
    out = {
        f"n_{name.lower()}": jnp.sum(status == code)
        for code, name in enumerate(events.STATUS_NAMES)
    }
    hit = status == events.HIT_EARTH
    T = result.u[:, -1]
    lat_land = lat_sign * result.u[:, 1] + lat_offset
    l_land = result.u[:, 0] / jnp.cos(lat_land) ** 2
    denom = jnp.maximum(jnp.sum(hit), 1)
    out["mean_group_delay_s"] = jnp.sum(jnp.where(hit, T, 0.0)) / denom
    out["mean_landing_l"] = jnp.sum(jnp.where(hit, l_land, 0.0)) / denom
    out["total_accepted_steps"] = jnp.sum(jnp.where(valid, result.n_accept, 0))
    out["total_rejected_steps"] = jnp.sum(jnp.where(valid, result.n_reject, 0))
    return out
