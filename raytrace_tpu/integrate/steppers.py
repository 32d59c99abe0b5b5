"""Runge-Kutta steppers: fixed RK4 and adaptive Dormand-Prince 5(4).

TPU-native replacement for the Sundials CVODE_BDF layer the reference calls
through Julia (RayMain.jl:387; see SURVEY.md section 2, N1). Both steppers
are written for a single ray (state vector u of shape (n,)) and batched with
jax.vmap at the solve level; each ray carries its own dt, so adaptive rays
diverge freely inside one SIMD batch.

Both steppers are FSAL-structured: the derivative at the *end* of the step
is computed as part of the step (DP5 has it for free; RK4's next k1 is
hoisted into the carry), so event localization gets cubic-Hermite endpoint
derivatives with zero extra RHS evaluations (integrate/events.py).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class StepOut(NamedTuple):
    u_new: jnp.ndarray      # proposed state at t + dt
    k_end: jnp.ndarray      # du/dt at (t + dt, u_new)  [FSAL]
    err: jnp.ndarray        # scalar error norm (adaptive; 0.0 for rk4)
    incr: jnp.ndarray       # the raw increment u_new - u (for compensated
                            # accumulation in the solve loop)


def rk4_step(rhs_fn, u, k1, dt):
    """Classic RK4 step. k1 = rhs(u) comes from the carry (FSAL-style)."""
    k2 = rhs_fn(u + 0.5 * dt * k1)
    k3 = rhs_fn(u + 0.5 * dt * k2)
    k4 = rhs_fn(u + dt * k3)
    incr = (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    u_new = u + incr
    k_end = rhs_fn(u_new)
    return StepOut(u_new, k_end, jnp.zeros_like(dt), incr)


# Dormand-Prince 5(4) tableau (Hairer, Norsett & Wanner, table II.5.2)
_DP_C = (0.2, 0.3, 0.8, 8.0 / 9.0, 1.0, 1.0)
_DP_A = (
    (0.2,),
    (3.0 / 40.0, 9.0 / 40.0),
    (44.0 / 45.0, -56.0 / 15.0, 32.0 / 9.0),
    (19372.0 / 6561.0, -25360.0 / 2187.0, 64448.0 / 6561.0, -212.0 / 729.0),
    (9017.0 / 3168.0, -355.0 / 33.0, 46732.0 / 5247.0, 49.0 / 176.0,
     -5103.0 / 18656.0),
    (35.0 / 384.0, 0.0, 500.0 / 1113.0, 125.0 / 192.0, -2187.0 / 6784.0,
     11.0 / 84.0),
)
# b (5th order) == last row of A (FSAL); b* (4th order embedded):
_DP_B5 = (35.0 / 384.0, 0.0, 500.0 / 1113.0, 125.0 / 192.0,
          -2187.0 / 6784.0, 11.0 / 84.0, 0.0)
_DP_B4 = (5179.0 / 57600.0, 0.0, 7571.0 / 16695.0, 393.0 / 640.0,
          -92097.0 / 339200.0, 187.0 / 2100.0, 1.0 / 40.0)


def _solve4(W, b):
    """Branch-free 4x4 linear solve via the adjugate (cofactor) formula.

    jnp.linalg.solve lowers batched small LU-with-pivoting, which is
    catastrophic under vmap on TPU (measured 30-60x slowdown of the whole
    Rosenbrock step vs this ~200-flop closed form). W = I - h*gamma*J is
    within O(h) of the identity at accepted step sizes, so det(W) ~ 1 and
    the cofactor solve is well-conditioned even in float32."""
    a = W
    s0 = a[0, 0] * a[1, 1] - a[1, 0] * a[0, 1]
    s1 = a[0, 0] * a[1, 2] - a[1, 0] * a[0, 2]
    s2 = a[0, 0] * a[1, 3] - a[1, 0] * a[0, 3]
    s3 = a[0, 1] * a[1, 2] - a[1, 1] * a[0, 2]
    s4 = a[0, 1] * a[1, 3] - a[1, 1] * a[0, 3]
    s5 = a[0, 2] * a[1, 3] - a[1, 2] * a[0, 3]
    c5 = a[2, 2] * a[3, 3] - a[3, 2] * a[2, 3]
    c4 = a[2, 1] * a[3, 3] - a[3, 1] * a[2, 3]
    c3 = a[2, 1] * a[3, 2] - a[3, 1] * a[2, 2]
    c2 = a[2, 0] * a[3, 3] - a[3, 0] * a[2, 3]
    c1 = a[2, 0] * a[3, 2] - a[3, 0] * a[2, 2]
    c0 = a[2, 0] * a[3, 1] - a[3, 0] * a[2, 1]
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv_det = 1.0 / det
    inv = jnp.stack([
        jnp.stack([
            a[1, 1] * c5 - a[1, 2] * c4 + a[1, 3] * c3,
            -a[0, 1] * c5 + a[0, 2] * c4 - a[0, 3] * c3,
            a[3, 1] * s5 - a[3, 2] * s4 + a[3, 3] * s3,
            -a[2, 1] * s5 + a[2, 2] * s4 - a[2, 3] * s3,
        ]),
        jnp.stack([
            -a[1, 0] * c5 + a[1, 2] * c2 - a[1, 3] * c1,
            a[0, 0] * c5 - a[0, 2] * c2 + a[0, 3] * c1,
            -a[3, 0] * s5 + a[3, 2] * s2 - a[3, 3] * s1,
            a[2, 0] * s5 - a[2, 2] * s2 + a[2, 3] * s1,
        ]),
        jnp.stack([
            a[1, 0] * c4 - a[1, 1] * c2 + a[1, 3] * c0,
            -a[0, 0] * c4 + a[0, 1] * c2 - a[0, 3] * c0,
            a[3, 0] * s4 - a[3, 1] * s2 + a[3, 3] * s0,
            -a[2, 0] * s4 + a[2, 1] * s2 - a[2, 3] * s0,
        ]),
        jnp.stack([
            -a[1, 0] * c3 + a[1, 1] * c1 - a[1, 2] * c0,
            a[0, 0] * c3 - a[0, 1] * c1 + a[0, 2] * c0,
            -a[3, 0] * s3 + a[3, 1] * s1 - a[3, 2] * s0,
            a[2, 0] * s3 - a[2, 1] * s1 + a[2, 2] * s0,
        ]),
    ]) * inv_det
    return inv @ b


def _solve_nopivot(W, b):
    """Branch-free unpivoted Gaussian elimination, statically unrolled.

    Serves every W-matrix size beyond the 4x4 adjugate (the 7-state 3D
    frame in particular). No pivoting is safe for the SAME reason the
    adjugate is (see _solve4): W = I - h*gamma*J is within O(h) of the
    identity at accepted step sizes, so every pivot is ~1 and elimination
    is well-conditioned without row exchanges. jnp.linalg.solve would
    lower batched pivoted LU under vmap -- the measured 30-60x Rosenbrock
    step penalty -- while this unrolls to ~n^3/3 fused vector ops. n is
    static, so the Python loops unroll at trace time (n = 7: ~100 row
    ops)."""
    n = W.shape[0]
    rows = [W[i] for i in range(n)]
    rhs = [b[i] for i in range(n)]
    for k in range(n):
        inv = 1.0 / rows[k][k]
        for i in range(k + 1, n):
            m = rows[i][k] * inv
            rows[i] = rows[i] - m * rows[k]
            rhs[i] = rhs[i] - m * rhs[k]
    x = [None] * n
    for k in reversed(range(n)):
        acc = rhs[k]
        for j in range(k + 1, n):
            acc = acc - rows[k][j] * x[j]
        x[k] = acc / rows[k][k]
    return jnp.stack(x)


def _solve_w(W, b):
    """Linear solve specialized for the small Rosenbrock W-matrices."""
    if W.shape[0] == 4:
        return _solve4(W, b)
    return _solve_nopivot(W, b)


def ros2_step(rhs_fn, u, k1, dt, rtol, atol):
    """L-stable 2-stage Rosenbrock (ROS2) step -- the stiff tier.

    The linearly implicit answer to the reference's CVODE_BDF
    (RayMain.jl:387): no Newton iteration, one Jacobian (via jax.jacfwd)
    and two linear solves per step. Derivation (order-2 conditions for a
    2-stage ROW method, b1 = b2 = 1/2, a21 = 1, c21 = -2*gamma; any gamma
    satisfies them, and gamma = 1 + 1/sqrt(2) makes it L-stable):

        (I - h g J) k1 = h f(u)
        (I - h g J) k2 = h f(u + k1) - 2 g h J k1
        u+ = u + (k1 + k2)/2

    Embedded order-1 solution u + k1 (linearly implicit Euler) gives the
    error estimate (k2 - k1)/2. k1 argument is the FSAL carry f(u) --
    reused as the stage-1 right-hand side. Cost ~ one DP5 step, but stable
    at any dt for stiff modes (whistler reflection points, the plasmapause
    knee) where explicit DP5 pays rejection storms."""
    gamma = 1.0 + 0.7071067811865476  # 1 + 1/sqrt(2)
    n = u.shape[0]
    J = jax.jacfwd(rhs_fn)(u)
    W = jnp.eye(n, dtype=u.dtype) - (dt * gamma) * J
    s1 = _solve_w(W, dt * k1)
    f2 = rhs_fn(u + s1)
    rhs2 = dt * f2 - (2.0 * gamma * dt) * (J @ s1)
    s2 = _solve_w(W, rhs2)
    u_new = u + 0.5 * (s1 + s2)
    k_end = rhs_fn(u_new)
    err_vec = 0.5 * (s2 - s1)
    scale = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u_new))
    err = jnp.sqrt(jnp.mean(jnp.square(err_vec / scale)))
    incr = 0.5 * (s1 + s2)
    return StepOut(u_new, k_end, err, incr)


def _ros2_sub(rhs_fn, u, f0, J, dt, gamma):
    """One raw ROS2 advance with a supplied Jacobian (W-method: the order-2
    conditions hold for an ARBITRARY matrix in place of the exact J --
    verified symbolically in ros2x_step's docstring derivation -- so J can
    be shared across sub-steps)."""
    n = u.shape[0]
    W = jnp.eye(n, dtype=u.dtype) - (dt * gamma) * J
    s1 = _solve_w(W, dt * f0)
    f2 = rhs_fn(u + s1)
    s2 = _solve_w(W, dt * f2 - (2.0 * gamma * dt) * (J @ s1))
    return u + 0.5 * (s1 + s2)


def ros2x_step(rhs_fn, u, k1, dt, rtol, atol):
    """Order-3 L-stable stiff step: Richardson-extrapolated ROS2.

    One full ROS2 step and two half steps share a single Jacobian (legal:
    with b1 = b2 = 1/2, a21 = 1, the zero-th order-2 condition on the
    Jacobian term reads gamma + b2*c21 = 0 for ANY matrix T substituted
    for J, giving c21 = -2 gamma -- ROS2 is a W-method, so a stale/shared
    J costs no order). The leading local error C h^3 then cancels in
    u_ex = (4 u_halves - u_full)/3, giving local O(h^4)/global order 3;
    (u_halves - u_full)/3 is the embedded estimate. The extrapolated
    stability function (4 R(z/2)^2 - R(z))/3 inherits R(inf) = 0.
    Cost ~ 1 jacfwd + 6 solves + 6 RHS: about 2x a DP5 step, for
    unconditional stiff stability at order 3."""
    gamma = 1.0 + 0.7071067811865476
    J = jax.jacfwd(rhs_fn)(u)
    h2 = 0.5 * dt
    u_full = _ros2_sub(rhs_fn, u, k1, J, dt, gamma)
    u_h = _ros2_sub(rhs_fn, u, k1, J, h2, gamma)
    k1b = rhs_fn(u_h)
    u_hh = _ros2_sub(rhs_fn, u_h, k1b, J, h2, gamma)
    u_new = (4.0 * u_hh - u_full) / 3.0
    k_end = rhs_fn(u_new)
    err_vec = (u_hh - u_full) / 3.0
    scale = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u_new))
    err = jnp.sqrt(jnp.mean(jnp.square(err_vec / scale)))
    return StepOut(u_new, k_end, err, u_new - u)


def ros4x_step(rhs_fn, u, k1, dt, rtol, atol):
    """Order-4 stiff step: two-level Richardson extrapolation of ROS2.

    The Rodas4-class tier for tight-tolerance stiff work (CVODE_BDF runs
    at orders 1-5; ros2/ros2x/ros4x cover orders 2-4 with the same
    W-method core). One macro step runs the 1-, 2-, and 4-substep ROS2
    chains off a single shared Jacobian (legal for any matrix -- see
    ros2x_step), then cancels the h^3 AND h^4 local-error terms:

        y_1 = u* + C3 h^3 +    C4 h^4       (1 step of h)
        y_2 = u* + C3 h^3/4 +  C4 h^4/8     (2 steps of h/2)
        y_4 = u* + C3 h^3/16 + C4 h^4/64    (4 steps of h/4)
        X1 = (4 y_2 - y_1)/3 = u* - C4 h^4/6
        X2 = (4 y_4 - y_2)/3 = u* - C4 h^4/48
        u+ = (8 X2 - X1)/7   = u* + O(h^5)  -> global order 4

    (the classic Deuflhard extrapolation of a linearly implicit base
    method, harmonic sequence {1,2,4}). Embedded estimate: the order-3
    pair difference (X2 - X1)/7. All three chains share one jacfwd; the
    base R(inf) = 0 makes every extrapolant vanish at z -> -inf.
    Cost ~ 1 jacfwd + 14 solves + 12 RHS: about 2x ros2x, in exchange for
    order 4 at unconditional stiff stability.

    Honest measured caveat (tests/test_ros2.py): on genuinely stiff
    problems both extrapolants suffer ORDER REDUCTION (W-method stage
    order is 1; Richardson cancels only the smooth h-expansion, not the
    stiff boundary-layer error terms), so the step-count advantage over
    ros2x at rtol 1e-9 is ~1.3-2x, not the asymptotic 5.6x -- ros4x pays
    off in accuracy per step at tight tolerance, matching how Rodas4
    relates to Rodas3 in practice."""
    gamma = 1.0 + 0.7071067811865476
    J = jax.jacfwd(rhs_fn)(u)
    h2 = 0.5 * dt
    h4 = 0.25 * dt
    y1 = _ros2_sub(rhs_fn, u, k1, J, dt, gamma)
    # 2 x h/2 chain
    a = _ros2_sub(rhs_fn, u, k1, J, h2, gamma)
    y2 = _ros2_sub(rhs_fn, a, rhs_fn(a), J, h2, gamma)
    # 4 x h/4 chain
    b = _ros2_sub(rhs_fn, u, k1, J, h4, gamma)
    for _ in range(3):
        b = _ros2_sub(rhs_fn, b, rhs_fn(b), J, h4, gamma)
    y4 = b
    x1 = (4.0 * y2 - y1) / 3.0
    x2 = (4.0 * y4 - y2) / 3.0
    u_new = (8.0 * x2 - x1) / 7.0
    k_end = rhs_fn(u_new)
    err_vec = (x2 - x1) / 7.0
    scale = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u_new))
    err = jnp.sqrt(jnp.mean(jnp.square(err_vec / scale)))
    return StepOut(u_new, k_end, err, u_new - u)


# ROS3PR-class coefficients, derived from scratch in tools/derive_ros3.py
# (order conditions generated by truncated-series defects on random cubic
# fields; the uniform-order structure from a symbolic Prothero-Robinson
# expansion; gamma from R(inf)=0 at order 3; the free parameter spent on
# the principal error constant). Re-run the script to reproduce.
_R3_G = 0.43586652150845899942
_R3_A31 = 1.0884445784759989947    # a21 = 1 (both stage abscissae at 1)
_R3_A32 = -0.088444578475998994722
_R3_G21 = 0.77263012766755107092
_R3_G31 = -0.42177791180933232805
_R3_G32 = -0.014088609699126671361
_R3_B = (2.0 / 3.0, -0.10253318817512566608, _R3_G)
_R3_BH = (0.51136529971586299474, -0.17502879700629931581,
          0.66366349729043632107)


def ros3pr_step(rhs_fn, u, k1, dt, rtol, atol):
    """Order-3 stiffly-accurate L-stable Rosenbrock step, stage-order-aware.

    The answer to the stiff tier's measured order reduction (ros2x/ros4x
    docstrings; tests/test_ros2.py): a ROS3PR-class scheme whose defect on
    the Prothero-Robinson problem vanishes in the stiff limit z -> -oo at
    EVERY h power (both stage abscissae at 1 + stiffly-accurate weights
    make every stiff-limit condition collapse to one identity -- see
    tools/derive_ros3.py, which derives the coefficient set from first
    principles in-repo). Where ros2x degrades toward order 2 on stiff
    boundary layers, this scheme holds order 3 uniformly in the stiffness
    (tests/test_ros3pr.py measures both).

    Cost per attempt: 1 jacfwd + 3 unpivoted W-solves + 3 J@k products +
    3 RHS evals (two stages at c = 1 plus the FSAL end-derivative) --
    about HALF a ros2x attempt (6 solves + 6 RHS). Exact Jacobian at u
    (jax.jacfwd), one shared W = I - h*gamma*J for all three stages.

    Embedded order-2 weights give the error estimate; their stability
    function is damped (Rhat(inf) = 0.5, chosen in the derivation) so the
    estimator does not blow up on stiff components. Like heun2, the
    embedded difference does not contain the end-derivative, so a
    non-finite k_end forces rejection explicitly."""
    gamma = _R3_G
    n = u.shape[0]
    J = jax.jacfwd(rhs_fn)(u)
    W = jnp.eye(n, dtype=u.dtype) - (dt * gamma) * J
    s1 = _solve_w(W, dt * k1)
    Js1 = J @ s1
    f2 = rhs_fn(u + s1)                      # a21 = 1
    s2 = _solve_w(W, dt * f2 + (_R3_G21 * dt) * Js1)
    f3 = rhs_fn(u + _R3_A31 * s1 + _R3_A32 * s2)
    s3 = _solve_w(
        W, dt * f3 + dt * (_R3_G31 * Js1 + _R3_G32 * (J @ s2))
    )
    incr = _R3_B[0] * s1 + _R3_B[1] * s2 + _R3_B[2] * s3
    u_new = u + incr
    k_end = rhs_fn(u_new)
    err_vec = (
        (_R3_B[0] - _R3_BH[0]) * s1
        + (_R3_B[1] - _R3_BH[1]) * s2
        + (_R3_B[2] - _R3_BH[2]) * s3
    )
    scale = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u_new))
    err = jnp.sqrt(jnp.mean(jnp.square(err_vec / scale)))
    err = jnp.where(jnp.all(jnp.isfinite(k_end)), err, jnp.inf)
    return StepOut(u_new, k_end, err, incr)


def bs3_step(rhs_fn, u, k1, dt, rtol, atol):
    """One Bogacki-Shampine 3(2) attempt (the classic ode23 pair).

    FSAL like DP5 but with HALF the stage cost: 3 fresh RHS evals per
    attempt (k1 carried) vs DP5's 6. Order 3, so at equal tolerance it
    takes more, cheaper steps -- the cheaper-per-attempt experiment for
    the headline workload (BASELINE.md roofline: the per-attempt RHS
    dependency chain IS the throughput ceiling, so halving stage count
    can beat a ~2x step-count increase). Tableau (Bogacki & Shampine
    1989): c = (1/2, 3/4, 1), a21 = 1/2, a32 = 3/4,
    b = (2/9, 1/3, 4/9) with the 3rd-order solution's own evaluation
    serving as k4 = f(u_new) (FSAL), embedded 2nd-order
    b* = (7/24, 1/4, 1/3, 1/8)."""
    k2 = rhs_fn(u + (0.5 * dt) * k1)
    k3 = rhs_fn(u + (0.75 * dt) * k2)
    incr = dt * (
        (2.0 / 9.0) * k1 + (1.0 / 3.0) * k2 + (4.0 / 9.0) * k3
    )
    u_new = u + incr
    k4 = rhs_fn(u_new)          # FSAL: next attempt's k1
    err_vec = dt * (
        (2.0 / 9.0 - 7.0 / 24.0) * k1 + (1.0 / 3.0 - 0.25) * k2
        + (4.0 / 9.0 - 1.0 / 3.0) * k3 - 0.125 * k4
    )
    scale = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u_new))
    err = jnp.sqrt(jnp.mean(jnp.square(err_vec / scale)))
    return StepOut(u_new, k4, err, incr)


def heun21_step(rhs_fn, u, k1, dt, rtol, atol):
    """One Heun (explicit trapezoid) 2(1) attempt -- the cheapest rung.

    Two fresh RHS evals per attempt (k1 carried): k2 at the Euler
    predictor, plus the FSAL end-derivative at u_new. Advance with the
    order-2 trapezoid u + dt (k1 + k2)/2; the embedded order-1 solution
    is the Euler predictor itself, so the error estimate is
    dt (k2 - k1)/2 at zero extra cost (local extrapolation, same
    convention as bs3/dopri5: advance high, control low).

    Rationale: the headline ensemble rides dt_max, not the error
    estimator (median accepted dt = 0.985 dt_max, BASELINE.md), so the
    binding cost is stage count per attempt. Order 2's penalty is a
    larger error estimate at the SAME dt -- err ~ (dt/h*)^2 instead of
    (dt/h*)^3 -- which pushes accuracy-limited rays below the ceiling
    earlier than bs3 would.

    MEASURED ANSWER (benchmarks/perf_r03e.json): the step inflation
    wins. On the 10,240-ray headline, heun2 needs 35.4M attempted steps
    vs bs3's 21.5M (+65%: at rtol 1e-5 the order-2 estimator takes most
    rays off the dt_max ceiling entirely), so 2/3 the stage cost nets
    0.711 s vs 0.577 s wall. BS3 sits at the sweet spot of the order
    ladder for this workload; heun2 stays available as the cheapest
    rung for coarser tolerances (physics parity is fine: 96.7% status
    agreement, median landing-L within 2e-4 of bs3)."""
    k2 = rhs_fn(u + dt * k1)
    incr = (0.5 * dt) * (k1 + k2)
    u_new = u + incr
    k_end = rhs_fn(u_new)       # FSAL: next attempt's k1
    err_vec = (0.5 * dt) * (k2 - k1)
    scale = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u_new))
    err = jnp.sqrt(jnp.mean(jnp.square(err_vec / scale)))
    # unlike bs3/dopri5, the embedded estimate does not contain the
    # end-derivative -- a step whose ENDPOINT lands on a dispersion
    # singularity (k_end non-finite, k2 finite) would be accepted and
    # poison the FSAL carry for every later attempt. Force such steps
    # to reject, matching the other FSAL pairs' behavior (their err
    # includes f(u_new) with nonzero weight).
    err = jnp.where(jnp.all(jnp.isfinite(k_end)), err, jnp.inf)
    return StepOut(u_new, k_end, err, incr)


def dopri5_step(rhs_fn, u, k1, dt, rtol, atol):
    """One DP5(4) attempt. Returns proposed state, FSAL k7, RMS error norm.

    err <= 1 means acceptable at (rtol, atol); the controller in
    integrate/solve.py decides accept/reject and the next dt."""
    ks = [k1]
    for row in _DP_A:
        acc = jnp.zeros_like(u)
        for a_ij, k_j in zip(row, ks):
            acc = acc + a_ij * k_j
        ks.append(rhs_fn(u + dt * acc))
    # ks[6] was evaluated at u + dt * (b5 . k) == u_new  (FSAL)
    incr = dt * sum(a_ij * k_j for a_ij, k_j in zip(_DP_A[-1], ks[:-1]))
    u_new = u + incr
    k7 = ks[6]
    err_vec = dt * sum(
        (b5 - b4) * k_j for b5, b4, k_j in zip(_DP_B5, _DP_B4, ks)
    )
    scale = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u_new))
    err = jnp.sqrt(jnp.mean(jnp.square(err_vec / scale)))
    return StepOut(u_new, k7, err, incr)
