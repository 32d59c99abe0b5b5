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
from time import perf_counter as _clock
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


def build_launch_list(rays, r0=(RE + 1.0e6) / RE, dtype=np.float32):
    """(u0 (N,4), f (N,)) from an explicit per-ray list of
    (lat, chi, freq) triples -- the `ray_start.dat` input style the
    reference planned but never built (README.md:11). Accepts any
    array-like of shape (N, 3); entries may also carry a 4th column r0."""
    rows = []
    for r in rays:
        r = list(map(float, r))
        if len(r) == 3:
            r.append(float(r0))
        if len(r) != 4:
            raise ValueError("each ray must be (lat, chi, freq[, r0])")
        rows.append(r)
    rays = np.asarray(rows, np.float64)
    n = rays.shape[0]
    u0 = np.zeros((n, 4), dtype)
    u0[:, 0] = rays[:, 3]
    u0[:, 1] = rays[:, 0]
    u0[:, 2] = rays[:, 1]
    return u0, rays[:, 2].astype(dtype)


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


def _frame_rhs(frame, env, grad_mode, root, legacy_freq_state):
    """(rhs_fn, group_delay_index) for a frame name -- the one dispatch
    shared by both tracer makers, so every knob (grad_mode,
    legacy_freq_state) reaches every frame through every entry point.

    legacy_freq_state reproduces the 2D reference scripts' freq-drifts-
    by-group-delay quirk (RayMain.jl:328 vs :344) for batch-scale parity
    runs; the 3D frame has no such quirk (freq is a true parameter
    there, RayTrace_3D.jl:334) and refuses the flag."""
    if frame == "2d_lat":
        return (lambda u, ff: rhs_mod.rhs_2d_lat(
            u, ff, env, legacy_freq_state=legacy_freq_state,
            grad_mode=grad_mode, root=root)), 3
    if frame == "2d_colat":
        return (lambda u, ff: rhs_mod.rhs_2d_colat(
            u, ff, env, legacy_freq_state=legacy_freq_state,
            grad_mode=grad_mode, root=root)), 3
    if frame == "3d":
        if legacy_freq_state:
            raise ValueError(
                "legacy_freq_state is a 2D-script quirk; the 3D frame "
                "already treats frequency as a parameter "
                "(RayTrace_3D.jl:334)"
            )
        return (lambda u, ff: rhs_mod.rhs_3d(
            u, ff, env, grad_mode=grad_mode, root=root)), 6
    raise ValueError(f"unknown frame {frame!r}")


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
    legacy_freq_state: bool = False,
    save_every: int = 0,
    save_fn=None,
):
    """Jitted (u0, f) -> TraceResult over the ray batch.

    frame: '2d_lat' | '2d_colat' | '3d'. With a mesh, inputs/outputs are
    sharded over the 'rays' axis (ICI data parallelism). save_every > 0
    turns on the per-step snapshot channel (the reference SavingCallback,
    RayTrace_lat.jl:318-330) -- see integrate.solve.trace."""
    rhs_fn, group_idx = _frame_rhs(frame, env, grad_mode, root,
                                   legacy_freq_state)

    def run(u0, f):
        return trace(
            rhs_fn, u0, f, cfg=cfg, spec=spec, group_idx=group_idx,
            adaptive=adaptive, stepper=stepper, max_steps=max_steps,
            chunk=chunk, save_every=save_every, save_fn=save_fn,
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


# --- packed carry transport ---------------------------------------------
# The rounds tracer keeps the whole RayCarry packed into ONE flat float
# array that stays ON DEVICE across rounds (round-2 second pass; the
# first pass coalesced the 13 per-field host fetches -- ~30 ms tunnel
# round-trip EACH -- into one transfer, this pass removes even that:
# per round the host fetches only the 4 bookkeeping columns and uploads
# the bucket index set; gather/scatter run on device in cont_sel). The
# int32 fields ride along exactly as floats: every value is bounded by
# max_steps << 2^24, inside the f32 mantissa (guarded in
# make_rounds_tracer). The same packing also serves checkpointing and the
# final one-shot fetch.

_INT_FIELDS = (
    "status", "n_accept", "n_reject", "rejected", "n_tiny", "caution",
)
_VEC_FIELDS = ("u", "k1", "u_prev", "u_lo")          # (B, n) in state order
_SCALAR_FIELDS = ("t", "dt", "errold", "dt_prev")    # (B,)
# packed column index of t (after the 4 state-vector blocks):
T_OF = {"t": 0, "dt": 1, "errold": 2, "dt_prev": 3, "f": 4}
# int columns live after the float scalars + f:
I_OF = {name: 5 + i for i, name in enumerate(_INT_FIELDS)}


def pack_carry(carry, f):
    """(carry, f) -> one (B, 4n + 5 + n_int_fields) array of the carry
    dtype."""
    cols = [getattr(carry, name) for name in _VEC_FIELDS]
    cols += [getattr(carry, name)[:, None] for name in _SCALAR_FIELDS]
    cols.append(f[:, None])
    cols += [
        getattr(carry, name)[:, None].astype(f.dtype) for name in _INT_FIELDS
    ]
    return jnp.concatenate(cols, axis=1)


def unpack_carry(fl, state_dim):
    """Inverse of pack_carry; works on jnp (in-jit) and np (host) arrays.

    Returns (RayCarry, f)."""
    from ..integrate.solve import RayCarry

    n = state_dim
    vecs = [fl[:, i * n:(i + 1) * n] for i in range(len(_VEC_FIELDS))]
    base = len(_VEC_FIELDS) * n
    kw = dict(zip(_VEC_FIELDS, vecs))
    kw.update(
        (name, fl[:, base + T_OF[name]]) for name in _SCALAR_FIELDS
    )
    f = fl[:, base + T_OF["f"]]
    kw.update(
        (name, fl[:, base + I_OF[name]].astype(jnp.int32))
        for name in _INT_FIELDS
    )
    return RayCarry(**kw), f


def packed_state_dim(fl):
    """State dimension n from a packed array's column count
    4n + len(scalars) + 1 + len(ints)."""
    return (fl.shape[1] - 5 - len(_INT_FIELDS)) // 4


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
    round_steps=(2048, 2048, 1024),
    chunk: int = 512,   # exit-check cadence (512 measured ~2% over 256 at 10k)
    grad_mode="fused",
    root=1.0,
    bucket_floor: int = 256,
    stall_progress: float = 1.0e-3,
    stiff_switch: float = 0.5,
    stiff_unswitch: float = 0.02,
    stiff_stepper: str = "ros3pr",
    base_stepper: str = "dopri5",
    order_switch_dt: float = 0.0,
    order_unswitch_dt: float = 0.5,
    tail_stepper: str = "",
    want_carry: bool = True,
    pipeline: int = 1,
    legacy_freq_state: bool = False,
    save_every: int = 0,
    save_fn=None,
):
    """Ensemble tracer with host-side bucketed re-batching.

    stepper="auto" (default) is the CVODE-style automatic method choice,
    at round granularity: every ray starts on explicit DP5; a ray whose
    rejection fraction over a round exceeds `stiff_switch` (the
    rejection-burst signature of stiff dynamics at whistler reflection
    points / the plasmapause knee -- measured 77% there) is re-bucketed
    into a stiff pool integrated with `stiff_stepper` (default ros3pr,
    the in-repo-derived stage-order-aware Rosenbrock: on the forced
    knee A/B it needs 7x fewer stiff attempts than ros2x on the 7-state
    frame at equal landings, benchmarks/perf_r03m.json; "ros2x" is the
    L-stable order-3 alternative, "ros4x" serves tight tolerances), and
    returns to DP5 when its round rejection falls below
    `stiff_unswitch`. Pools are separate compiled programs over the same
    RayCarry, so the switch is exact (dt/controller state carry over) and
    costs nothing per step -- a per-step lax.cond would execute BOTH
    steppers on every lane under vmap. Explicit "dopri5"/"bs3"/"ros2"/
    "ros2x" pin the method for every ray.

    base_stepper: auto mode's NON-STIFF pool method ("dopri5" default;
    "bs3" halves the stage cost per attempt -- the right choice when the
    workload rides dt_max rather than the error estimator, which the
    headline ensemble does: median accepted dt = 0.985 dt_max,
    benchmarks/perf_r03.json). Ignored unless stepper == "auto".

    With a cheap base (base_stepper="bs3"), auto mode runs THREE pools
    -- the round-granularity version of CVODE's order selection:
      - bs3 while the ray rides the dt ceiling (order is irrelevant
        there, stage cost is everything);
      - dopri5 for ACCURACY-limited rays (mean accepted dt over a round
        below order_switch_dt * dt_max at low rejection): order 5 takes
        ~epsilon^(-2/15) ~ 4.6x bigger steps than order 3 at the same
        tolerance for 2x the stage cost -- the straggler tail's regime;
      - ros2x for stiff rays (rejection burst), as before.
    order_switch_dt/order_unswitch_dt give the hysteresis; switching is
    exact for the same reason the stiff hand-off is (the carry holds
    dt + controller memory, and FSAL k1 is a plain RHS eval for every
    explicit method). Default OFF (order_switch_dt=0): measured on the
    tunneled chip (benchmarks/perf_r03d.json), the dp5 pool cuts
    attempted steps by ~230k and rescues 23 budget-exhausted stragglers
    (MAX_STEPS 31 -> 8) but the extra per-round program costs ~5% wall
    -- the same dispatch-economics law as pipeline>1. Enable (~0.12) on
    hosts with cheap dispatch or when completion within a fixed budget
    matters more than wall.

    tail_stepper: the non-stiff method for the MERGED-TAIL round (auto
    mode only; "" -- the default -- keeps base_stepper). Once the
    active set stops paying for re-bucketing (n_active * 4 <= floor),
    the remaining budget runs as ONE round -- and the rays still alive
    there are the ones the scheduled rounds did not finish, i.e.
    accuracy-limited (ceiling-riders exhaust the phase budget in
    ~t_max/dt_max ~ 5k steps; stiff rays are in their own pool), which
    is order 5's regime on paper (~4.6x bigger steps than the bs3 base
    for 2x the stage cost, zero extra programs since the merged tail is
    its own program either way). MEASURED NEGATIVE on the headline
    (benchmarks/perf_r03g.json): the 47-straggler tail at a 256-lane
    bucket is LATENCY-bound, so an attempt costs serialized chain
    latency, not FLOPs -- dopri5's 6-eval chain doubles the per-attempt
    cost while cutting attempts only 1.48x (596k -> 403k; the caution
    cap on dt regrowth near resonance cones, not smooth-regime order
    theory, limits the gain), tail wall 0.104 -> 0.161 s. It DOES
    rescue budget-exhausted stragglers (MAX_STEPS 31 -> 10 at 99.8%
    status agreement): set "dopri5" on compute-bound (non-tunneled,
    wide-tail) topologies or when completion within a fixed budget
    matters more than wall. Pool hand-off is exact as always (the
    carry holds dt + controller memory; FSAL k1 is a plain RHS eval
    for every explicit method).

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
    still-active rays into the next power-of-two bucket ON DEVICE (the
    host sees 4 bookkeeping columns and sends back an index list) and
    continue from their exact RayCarry (bitwise-identical to the
    uninterrupted run -- the carry holds dt, controller memory and FSAL
    derivative). The default schedule shrinks rounds as the active set
    shrinks ((2048, 2048, 1024), floor 256 -- tuned per-round on chip,
    BASELINE.md) because late rounds run latency-bound at small widths.
    The returned `run(u0, f, valid)` holds its jitted start/continue
    programs, compiled once per bucket size and reused across rounds and
    calls; `run.last_rounds` records per-round timing diagnostics.

    want_carry=False skips the final full-carry fetch (the result fetches
    only the u/t/status/step-count columns, ~60% less tunnel traffic) and
    returns TraceResult(carry=None) -- use when the caller does not
    checkpoint/resume from the result.

    pipeline: max parts a round's index set is decomposed into (binary
    power-of-two-of-floor sizes, see _split_parts). All parts dispatch
    before any stats fetch, so host bookkeeping and tunnel round-trips
    can overlap device compute; per-ray results are exactly independent
    of the grouping (test-pinned). Default 1 (one bucket per round):
    on the tunneled single-chip setup every extra program costs more in
    dispatch than it hides (measured 0.975 / 0.997 / 1.101 s at
    pipeline 1 / 2 / 3 on the 10k headline) -- the knob exists for
    topologies with genuinely asynchronous dispatch.

    save_every > 0 turns on the TRAJECTORY CHANNEL (the reference's
    SavingCallback, RayTrace_lat.jl:318-330, at production ensemble
    scale): each round integrates under lax.scan and emits a decimated
    snapshot block (u, t, status [, save_fn extras]) every save_every
    attempted steps, which rides the round's existing device->host
    transfer -- device memory stays bounded by ONE round's block
    (round_steps/save_every x bucket x state), never the full
    max_steps history. The host scatters each ray's block rows at its
    own snapshot cursor (rays in different stepper pools advance their
    cursors at their own round budgets) and forward-fills terminated
    rays with their frozen terminal state -- exactly what the
    single-shot trace(save_every=...) scan records for retired lanes,
    so with a pinned stepper the assembled trajectory equals the
    single-shot channel bitwise (test_rounds.py). Requires every round
    length and max_steps to be multiples of save_every (snapshot
    cadence then aligns across round boundaries). Costs the
    within-round early exit (scan, not while_loop) -- the same trade
    the single-shot trajectory tracer makes over the WHOLE budget,
    here bounded per round. save_fn(u, f) appends per-snapshot
    diagnostics (e.g. integrate.saving.save_fn_for's
    (mu, dmu/dpsi, dip, psi))."""
    rhs_fn, group_idx = _frame_rhs(frame, env, grad_mode, root,
                                   legacy_freq_state)

    # round_steps: int (uniform) or a schedule tuple -- short early rounds
    # retire the fast majority cheaply, long late rounds amortize per-round
    # overhead for the stragglers; the last entry repeats.
    schedule = (
        tuple(round_steps) if isinstance(round_steps, (tuple, list))
        else (int(round_steps),)
    )

    save_on = save_every > 0
    if save_on:
        bad = [n for n in schedule + (max_steps,) if n % save_every]
        if bad:
            raise ValueError(
                "the trajectory channel needs every round length and "
                f"max_steps to be multiples of save_every={save_every}; "
                f"got {bad} (snapshot cadence must align across rounds)"
            )
        # the stiff pool's short-round cap, rounded to the cadence
        stiff_cap = max(save_every, 1024 - 1024 % save_every)
    else:
        stiff_cap = 1024

    # base_stepper only applies in auto mode (the non-stiff pool's
    # method); an explicit stepper pins every ray to that method
    auto = stepper == "auto"
    if not auto:
        base_stepper = stepper
    # third pool (order selection) only exists when the base is cheaper
    # than dopri5 -- see the docstring
    order_pools = (
        auto and base_stepper != "dopri5" and order_switch_dt > 0.0
    )
    if order_pools and float(cfg.ds_max) > 0.0:
        # the switch/unswitch hysteresis is calibrated against cfg.dt_max
        # as THE effective ceiling; under an arc-length ceiling the
        # effective cap is state-dependent (ds_max / arc rate), so
        # dt_max-relative thresholds would mis-scale (e.g. a ray pinned
        # by the arc cap looks "accuracy-limited" and can never reach
        # the dt_max-relative unswitch level). Refuse rather than route
        # rays wrongly.
        raise ValueError(
            "order_switch_dt > 0 (three-pool order selection) is not "
            "supported together with SolverConfig.ds_max: the dt_max-"
            "relative switch thresholds do not apply under an arc-length "
            "ceiling"
        )
    _dtmax = float(cfg.dt_max)

    def make_kw(n, st):
        return dict(
            cfg=cfg, spec=spec, group_idx=group_idx, adaptive=adaptive,
            stepper=st, max_steps=n, chunk=min(chunk, n),
            save_every=save_every, save_fn=save_fn,
        )

    # start/cont speak the packed-carry protocol (ONE flat array instead
    # of 13 buffers) so every host sync is a single transfer each way --
    # see pack_carry above for why that matters on a tunneled chip
    if max_steps >= (1 << 24):
        raise ValueError(
            "max_steps must stay below 2^24 so the step counters ride the "
            "packed float transport exactly"
        )

    def _stat_cols(sd):
        base = 4 * sd
        return (base + T_OF["t"], base + I_OF["status"],
                base + I_OF["n_accept"], base + I_OF["n_reject"])

    # start/cont return (packed carry, bookkeeping columns) from ONE
    # program: the 4-column stats mirror rides the round's dispatch
    # instead of costing a second jit dispatch + fetch round-trip per
    # round (~10-30 ms each on the tunneled chip). Round 0 has its own
    # fused init+integrate program over the full batch (no gather/scatter,
    # and there is no host bookkeeping to hide under it anyway --
    # measured ~100 ms cheaper than init-then-cont on the 10k headline).
    @partial(jax.jit, static_argnums=2)
    def start(u, ff, n):
        res = trace(rhs_fn, u, ff, **make_kw(n, base_stepper))
        fl = pack_carry(res.carry, ff)
        return fl, fl[:, jnp.asarray(_stat_cols(u.shape[1]))], res.traj

    # device-resident rounds: the full packed carry never leaves the chip
    # between rounds. Each round gathers its bucket by index, integrates,
    # and scatters back; the host sees only the 4 bookkeeping columns
    # (t, status, n_accept, n_reject -- one small transfer per round)
    # plus the index upload. On the tunneled chip this removes the
    # ~1 MB x 2 packed transfers per round that the round-1 packed
    # transport had merely coalesced.
    @partial(jax.jit, static_argnums=(2, 3))
    def cont_sel(fl_full, sel, nr, st):
        sd = packed_state_dim(fl_full)
        bucket = jnp.take(fl_full, sel, axis=0)
        carry, ff = unpack_carry(bucket, sd)
        res = trace(rhs_fn, carry.u, ff, carry0=carry, **make_kw(nr, st))
        out = pack_carry(res.carry, ff)
        # pad lanes are duplicates of sel[0]; duplicate-index scatter is
        # well-defined here because every duplicate writes identical rows
        fl_new = fl_full.at[sel].set(out)
        return fl_new, fl_new[:, jnp.asarray(_stat_cols(sd))], res.traj

    # small buckets are latency-bound on TPU (10k lanes ~ 80 VPU tiles
    # already borderline); keep at least bucket_floor lanes per round
    floor = max((mesh.devices.size if mesh is not None else 1) * 8,
                bucket_floor)

    def round_len(i):
        return schedule[min(i, len(schedule) - 1)]

    # jitted light final fetch: the result columns only (u, t, status,
    # n_accept, n_reject) for want_carry=False
    _final_fetchers = {}

    def _final_fetch(sd):
        if sd not in _final_fetchers:
            base = 4 * sd
            cols = tuple(range(sd)) + (
                base + T_OF["t"], base + I_OF["status"],
                base + I_OF["n_accept"], base + I_OF["n_reject"],
            )
            _final_fetchers[sd] = jax.jit(lambda a: a[:, jnp.asarray(cols)])
        return _final_fetchers[sd]

    T_, ST_, ACC_, REJ_ = 0, 1, 2, 3  # columns of the host stats mirror

    def _split_parts(idx_all, max_parts):
        """Decompose an index set into <= max_parts contiguous parts whose
        sizes are power-of-two multiples of the bucket floor (the last
        part takes the remainder). Two jobs at once: (a) the binary
        decomposition wastes less bucket padding than one power-of-two
        bucket (e.g. 3370 rays -> 2048 + 1024 + 512 = 3584 lanes instead
        of one 4096 bucket), and (b) the parts PIPELINE -- all parts are
        dispatched back-to-back before any stats fetch, so the host
        bookkeeping + tunnel round-trips of part k+1 hide under part k's
        device compute (the device executes queued programs in order)."""
        units = -(-idx_all.size // floor)
        if units < 2 or max_parts < 2:
            return [idx_all]
        sizes, u = [], units
        bit = 1 << (units.bit_length() - 1)
        while bit:
            if u >= bit:
                sizes.append(bit)
                u -= bit
            bit >>= 1
        while len(sizes) > max_parts:      # merge the small tail
            sizes.append(sizes.pop() + sizes.pop())
        # halve the largest while the part budget lasts (keeps powers of
        # two, so the compiled bucket-size set stays small)
        while len(sizes) < max_parts and max(sizes) >= 4:
            m = max(sizes)
            sizes.remove(m)
            sizes += [m - m // 2, m // 2]
        sizes.sort(reverse=True)
        parts, startp = [], 0
        for k, s in enumerate(sizes):
            count = (
                s * floor if k < len(sizes) - 1 else idx_all.size - startp
            )
            count = min(count, idx_all.size - startp)
            parts.append(idx_all[startp:startp + count])
            startp += count
        return [p for p in parts if p.size]

    def run(u0, f, valid):
        run.last_rounds = []                  # per-round timing diagnostics
        n = u0.shape[0]
        sd = u0.shape[1]                      # state dimension
        # the packed carry stays ON DEVICE across rounds; `hs` is the
        # host mirror of its 4 bookkeeping columns only
        first = min(round_len(0), max_steps)
        w0_start = _clock()
        fl_dev, st_dev, tr_dev = start(jnp.asarray(u0), jnp.asarray(f),
                                       first)
        # trajectory channel: host-side per-ray snapshot buffers + cursor
        # (next snap slot per ray -- pools advance at their own budgets)
        if save_on:
            n_snaps = max_steps // save_every
            s0 = first // save_every
            tr0 = {k: np.asarray(v) for k, v in tr_dev.items()}
            traj_buf = {
                k: np.zeros((n_snaps,) + v.shape[1:], v.dtype)
                for k, v in tr0.items()
            }
            for k, v in tr0.items():
                traj_buf[k][:s0] = v
            cursor = np.full(n, s0, np.int64)
        fetch_dev = None   # speculative final-fetch handle
        if first >= max_steps:
            # single-round schedule (run.py's tiny-batch path): round 0
            # already exhausts the budget, so dispatch the final fetch
            # before the blocking stats read -- same overlap as the
            # budget-exhausting round inside the loop below
            if not want_carry:
                fetch_dev = _final_fetch(sd)(fl_dev)
            else:
                try:
                    fl_dev.copy_to_host_async()
                except AttributeError:
                    pass
        hs = np.asarray(st_dev)
        run.last_rounds.append(dict(
            stepper=base_stepper, active=n, bucket=n, steps=first,
            attempted=int(hs[:, ACC_].sum() + hs[:, REJ_].sum()),
            wall_s=_clock() - w0_start,
        ))

        # host-side status overrides (stall retirement): the device copy
        # keeps ACTIVE, but overridden rays never enter another round and
        # the final result patches the status column
        override = np.full(n, -1, np.int32)

        # per-ray stiff flag (auto mode): rejection burst -> stiff pool.
        # Switching is gated on PROGRESS: a bursting ray that also made no
        # phase-path progress is a Zeno ray wedged on a dispersion
        # singularity -- not stiff-solvable; it gets DT_UNDERFLOW from the
        # stall check instead of an (expensive) ros2x round.
        stiff = np.zeros(n, bool)
        # per-ray accuracy-limited flag (order_pools): mean accepted dt
        # far below the ceiling at low rejection -> the dopri5 pool
        slow = np.zeros(n, bool)

        # a round's trace marks unfinished rays MAX_STEPS (the per-round
        # budget ran out, still integrable); the next round's resume
        # re-activates them, so "alive" here means ACTIVE or MAX_STEPS
        def _alive(status_col):
            return (status_col == events.ACTIVE) | (
                status_col == events.MAX_STEPS
            )

        def settle(idx, rf, prog, is_stiff_pool, acc_delta):
            """Post-round bookkeeping for the rays in idx: stall
            retirement first, then stiff/order pool membership updates.
            is_stiff_pool is POOL identity, not method name: a
            tail_stepper that happens to equal stiff_stepper must not
            route its rays through the unswitch branch."""
            still = _alive(hs[idx, ST_]) & (override[idx] < 0)
            if stall_progress > 0.0:
                stalled = still & (prog < stall_progress)
                override[idx[stalled]] = events.DT_UNDERFLOW
                still = still & ~stalled
            if auto and is_stiff_pool:
                stiff[idx[still & (rf < stiff_unswitch)]] = False
            elif auto:
                stiff[idx[still & (rf > stiff_switch)]] = True
            if order_pools:
                # mean accepted dt over this round vs the ceiling: rays
                # accepting tiny steps at low rejection are accuracy-
                # limited -> order 5 takes ~4.6x bigger steps at 2x cost
                md = prog / np.maximum(acc_delta, 1)
                ok = still & ~stiff[idx]
                slow[idx[
                    ok & (md < order_switch_dt * _dtmax)
                    & (rf < stiff_switch)
                ]] = True
                slow[idx[ok & (md > order_unswitch_dt * _dtmax)]] = False

        # round-0 bookkeeping (the start program ran all rays on the base
        # stepper from t = 0, so the baselines are zero)
        idx0 = np.nonzero(np.asarray(valid))[0]
        att0 = hs[idx0, ACC_] + hs[idx0, REJ_]
        settle(idx0, hs[idx0, REJ_] / np.maximum(att0, 1), hs[idx0, T_],
               False, hs[idx0, ACC_])

        steps_done = first
        i = 1
        while steps_done < max_steps:
            active = (
                _alive(hs[:, ST_]) & (override < 0) & np.asarray(valid)
            )
            if not active.any():
                break
            # merge the straggler tail: once the active set stops paying
            # for re-bucketing (it no longer halves), run the whole
            # remaining budget in one round instead of ping-ponging
            # fixed-length rounds through the tunnel
            n_active = int(active.sum())
            merged_tail = n_active * 4 <= floor
            if merged_tail:
                nr = max_steps - steps_done
            else:
                nr = min(round_len(i), max_steps - steps_done)
            # merged tail: accuracy-limited stragglers -> order 5 (see
            # the tail_stepper docstring); auto mode only, so pinned-
            # stepper runs stay method-pure
            base_st = (
                tail_stepper if (auto and merged_tail and tail_stepper)
                else base_stepper
            )
            # snapshot pool membership: rays marked stiff by THIS round's
            # settle must wait for the next round, or they would run
            # both pools in one round (double-stepping past max_steps)
            pool_mask = stiff.copy()
            if order_pools:
                slow_mask = slow.copy() & ~pool_mask
                pools = (
                    (~pool_mask & ~slow_mask, base_st, False),
                    (slow_mask, "dopri5", False),
                    (pool_mask, stiff_stepper, True),
                )
            elif auto:
                pools = (
                    (~pool_mask, base_st, False),
                    (pool_mask, stiff_stepper, True),
                )
            else:
                pools = ((np.ones(n, bool), base_st, False),)
            # dispatch phase: queue every pool/part program without
            # waiting; fetch phase below then drains the stats in order.
            # Per-ray results are independent of the grouping (vmap lanes
            # never interact), so splitting is exact.
            jobs = []
            for mask, st, is_stiff_pool in pools:
                idx_all = np.nonzero(active & mask)[0]
                if idx_all.size == 0:
                    continue
                # the stiff pool runs short rounds: an L-stable method
                # covers the same span in far fewer steps, and rays that
                # turn out to be wedged on a singularity (both methods
                # reject everything) reach the stall check after at most
                # 1024 wasted attempts instead of a full dp5-length round.
                # Keyed on pool identity, not method name: a Rosenbrock
                # tail_stepper must still run the full merged-tail budget.
                nr_pool = min(nr, stiff_cap) if is_stiff_pool else nr
                for idx in _split_parts(idx_all, pipeline):
                    w0 = _clock()
                    b = _bucket_size(idx.size, n, floor)
                    sel = np.concatenate(
                        [idx, np.repeat(idx[:1], b - idx.size)]
                    )
                    acc0 = hs[idx, ACC_].copy()
                    rej0 = hs[idx, REJ_].copy()
                    t0 = hs[idx, T_].copy()
                    fl_dev, st_dev, tr_dev = cont_sel(
                        fl_dev, jnp.asarray(sel, jnp.int32), nr_pool, st
                    )
                    jobs.append((idx, st, is_stiff_pool, nr_pool, b, acc0,
                                 rej0, t0, w0, st_dev, tr_dev))
            if steps_done + nr >= max_steps:
                # this round exhausts the budget, so the while loop
                # provably exits after it: dispatch the final fetch NOW,
                # before draining any stats -- the fetch program (or the
                # async D2H of the full carry) queues behind the round's
                # programs and its dispatch + transfer latency hides
                # under the device compute of the (typically merged-
                # tail) round instead of serializing after it
                if not want_carry:
                    fetch_dev = _final_fetch(sd)(fl_dev)
                else:
                    try:
                        fl_dev.copy_to_host_async()
                    except AttributeError:
                        pass
            for (idx, st, is_stiff_pool, nr_pool, b, acc0, rej0, t0, w0,
                 st_dev, tr_dev) in jobs:
                hs = np.asarray(st_dev)
                if save_on:
                    # scatter the bucket's snapshot block at each ray's
                    # own cursor (pad lanes beyond idx.size are dropped)
                    s_blk = nr_pool // save_every
                    rows = cursor[idx][None, :] + np.arange(s_blk)[:, None]
                    for k, v in tr_dev.items():
                        blk = np.asarray(v)[:, :idx.size]
                        traj_buf[k][rows, idx[None, :]] = blk
                    cursor[idx] += s_blk
                att = (hs[idx, ACC_] - acc0) + (hs[idx, REJ_] - rej0)
                rf = (hs[idx, REJ_] - rej0) / np.maximum(att, 1)
                run.last_rounds.append(dict(
                    stepper=st, active=int(idx.size), bucket=b,
                    steps=nr_pool, attempted=int(att.sum()),
                    wall_s=_clock() - w0,
                ))
                settle(idx, rf, prog=hs[idx, T_] - t0,
                       is_stiff_pool=is_stiff_pool,
                       acc_delta=hs[idx, ACC_] - acc0)
            steps_done += nr
            i += 1

        run.last_stiff = stiff  # which rays ended on the stiff pool
        run.last_slow = slow    # which rays ended on the dopri5 pool
        if save_on:
            # assemble: gather row min(k, cursor-1) per ray, so rows past
            # a ray's cursor forward-fill its last snapshot -- the exact
            # frozen state the single-shot scan keeps recording for
            # retired lanes, hence pinned-stepper bitwise equality with
            # trace(save_every=...) (test_rounds.py). Stiff-pool rays,
            # whose shorter rounds take fewer snapshots, hold their last
            # round-end state instead (rounds-tracer-specific).
            rows_ix = np.minimum(
                np.arange(n_snaps)[:, None],
                np.maximum(cursor - 1, 0)[None, :],
            )
            cols_ix = np.arange(n)[None, :]
            traj_out = {k: v[rows_ix, cols_ix] for k, v in traj_buf.items()}
        else:
            traj_out = None
        patch = override >= 0
        if not want_carry:
            # light fetch: result columns only (no solver-internal
            # state); reuse the speculative dispatch when the loop
            # exited by budget exhaustion (fetch_dev is fl_dev-final in
            # that case -- no round runs after the dispatch)
            cols = np.asarray(
                fetch_dev if fetch_dev is not None
                else _final_fetch(sd)(fl_dev)
            ).copy()
            status = cols[:, sd + 1].astype(np.int32)
            status[patch] = override[patch]
            return TraceResult(
                u=cols[:, :sd], t=cols[:, sd], status=status,
                n_accept=cols[:, sd + 2].astype(np.int32),
                n_reject=cols[:, sd + 3].astype(np.int32),
                traj=traj_out, carry=None,
            )
        # one full fetch at the end; apply the host-side status overrides
        fl = np.asarray(fl_dev).copy()
        base = 4 * sd
        st_col = base + I_OF["status"]
        fl[patch, st_col] = override[patch]
        final, _ = unpack_carry(fl, sd)
        return TraceResult(
            u=final.u, t=final.t, status=final.status,
            n_accept=final.n_accept, n_reject=final.n_reject,
            traj=traj_out, carry=final,
        )

    run.last_stiff = None
    run.last_slow = None
    run.last_rounds = []
    return run


def ensemble_stats(result, valid, lat_sign=1.0, lat_offset=0.0, xp=jnp):
    """Summary statistics over a traced ensemble.

    Returns a dict of scalars: per-status counts, mean/max group delay and
    landing L-shell among surface hits, total accepted steps.

    lat_sign/lat_offset map state[1] to magnetic latitude (the StopSpec
    convention): (+1, 0) for the latitude frame, (-1, pi/2) for the
    colatitude frames (2d_colat and 3d), where state[1] is colatitude
    theta and L = r / cos^2(lat) = r / sin^2(theta).

    xp: jnp (default; collective-safe inside jit on sharded results) or
    np -- pass np when the result is already host-resident (the rounds
    tracer): jnp here would ship every reduction to the device, and on
    the tunneled chip each of the ~15 scalar fetches costs a ~30 ms
    round-trip."""
    valid = xp.asarray(valid)
    status = xp.where(valid, result.status, PAD_STATUS)
    out = {
        f"n_{name.lower()}": xp.sum(status == code)
        for code, name in enumerate(events.STATUS_NAMES)
    }
    hit = status == events.HIT_EARTH
    T = result.u[:, -1]
    lat_land = lat_sign * result.u[:, 1] + lat_offset
    l_land = result.u[:, 0] / xp.cos(lat_land) ** 2
    n_hit = xp.sum(hit)
    denom = xp.maximum(n_hit, 1)
    out["mean_group_delay_s"] = xp.sum(xp.where(hit, T, 0.0)) / denom
    out["mean_landing_l"] = xp.sum(xp.where(hit, l_land, 0.0)) / denom
    # medians too: rays that wrap over the pole land with cos(lat) ~ 0,
    # and a single such outlier (L ~ 1e5) dominates the mean. Masked
    # median via sort + dynamic index (works for np and jnp alike).
    # Empty hit set falls back to 0.0 like the mean fields (the inf
    # padding value at index 0 would otherwise flow into run-record JSON
    # as the non-standard 'Infinity' token).
    mid = xp.maximum(n_hit - 1, 0) // 2
    any_hit = n_hit > 0
    out["median_landing_l"] = xp.where(
        any_hit, xp.sort(xp.where(hit, l_land, xp.inf))[mid], 0.0
    )
    out["median_group_delay_s"] = xp.where(
        any_hit, xp.sort(xp.where(hit, T, xp.inf))[mid], 0.0
    )
    out["total_accepted_steps"] = xp.sum(xp.where(valid, result.n_accept, 0))
    out["total_rejected_steps"] = xp.sum(xp.where(valid, result.n_reject, 0))
    # quirk census: rays whose final group delay is NEGATIVE spent their
    # life in the abs(mu^2) evanescent-tracing regime the reference
    # knowingly integrates (RayMain.jl:243 comment lineage; docs/
    # NOTE_3D_GROUP_DELAY.md) -- physically a non-propagating branch, so
    # any downstream observable should exclude them. Surfacing the count
    # makes the regime visible in every run record instead of silently
    # polluting delay statistics (seen in the low-frequency MR band).
    out["n_retrograde_t"] = xp.sum(xp.where(valid, T < 0.0, False))
    return out
