"""End-to-end bug-compatible trajectory goldens (reference parity).

The reference's real output is its trajectories (RayMain.jl:382-387,
RayTrace_lat.jl:333-338). Julia is not installed here, so the goldens are
pinned from TWO independent implementations of the bug-compatible physics
(grad_mode="reference" + legacy_freq_state: analytic dmu/dpsi as written,
dmu/dr == 0, frequency drifting by the accumulated group delay):

  - the JAX CPU float64 path, and
  - the native C++ oracle (GRAD_REFERENCE | LEGACY_FREQ -- different
    algebra, different language, different integrator implementation),

which agree to ~1e-8 in state at rtol 1e-9. These tests fail if the
bug-compatible physics drifts in EITHER implementation.

Workload notes discovered while pinning (see docstrings below):
  - config 1 (RayMain, f = 5000 Hz) wedges against a dispersion
    singularity at phase path t ~ 40.36 RE in reference mode: the native
    path no-op-accepts ~256k microscopic steps there while the JAX stall
    detection flags DT_UNDERFLOW at the same state. The golden is pinned
    at t_max = 40 RE, just before the wedge.
  - config 2 (RayTrace_lat, f = 1000 Hz) never reaches the surface within
    the reference tspan in reference mode; the golden is the state at the
    full phase budget (MAX_PHASE_TIME).
"""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end suites; fast gate runs -m 'not slow'

from raytrace_tpu import native
from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.models import make_env_lat, make_env_raymain
from raytrace_tpu.ops import rhs

U0 = np.array([(RE + 1.0e6) / RE, np.pi / 4, 0.0, 0.0])
GM_NATIVE = native.GRAD_REFERENCE | native.LEGACY_FREQ
KW = dict(rtol=1e-9, atol=1e-14)

# golden states, generated at rtol 1e-9 / atol 1e-14 (both implementations
# agree to ~1e-8; pinned at 1e-6 to leave room for benign platform noise)
GOLD_RAYMAIN_T40 = np.array([1.68357074, 1.79234569, 0.49686928, 0.39099545])
GOLD_LAT_BUDGET = np.array([2.22037210, 0.10556103, -0.20884739, 0.36037])


def _jax_trace(rhs_fn, f, spec):
    return trace(
        rhs_fn, jnp.asarray(U0)[None], jnp.array([f]),
        cfg=SolverConfig(dt0=1e-4, **KW), spec=spec,
        max_steps=100000, chunk=256,
    )


def test_golden_raymain_reference_mode():
    """Config 1 (RayMain.jl:382-387) in bug-compatible mode, t_max=40 RE."""
    env = make_env_raymain()
    t_max = 40.0
    nat = native.trace_2d(
        U0, 5000.0, env, frame=native.FRAME_COLAT, grad_mode=GM_NATIVE,
        t_max=t_max, max_steps=100000, **KW,
    )
    res = _jax_trace(
        lambda u, ff: rhs.rhs_2d_colat(
            u, ff, env, legacy_freq_state=True, grad_mode="reference"),
        5000.0,
        StopSpec(r_floor=1.0, t_max=t_max, lat_sign=-1.0, lat_offset=np.pi / 2),
    )
    uj = np.asarray(res.u[0])
    assert nat["status"] == events.MAX_PHASE_TIME
    assert int(res.status[0]) == events.MAX_PHASE_TIME
    # cross-language agreement (independent implementations)
    np.testing.assert_allclose(nat["u"], uj, rtol=1e-6)
    # pinned golden: fails if the bug-compatible physics drifts
    np.testing.assert_allclose(uj[:3], GOLD_RAYMAIN_T40[:3], rtol=1e-6)
    assert uj[3] == pytest.approx(GOLD_RAYMAIN_T40[3], rel=1e-4)


def test_golden_lat_reference_mode():
    """Config 2 (RayTrace_lat.jl:333-338) in bug-compatible mode, full
    phase budget."""
    env = make_env_lat()
    t_max = 5.0e9 / RE
    nat = native.trace_2d(
        U0, 1000.0, env, frame=native.FRAME_LAT, grad_mode=GM_NATIVE,
        t_max=t_max, max_steps=100000, **KW,
    )
    res = _jax_trace(
        lambda u, ff: rhs.rhs_2d_lat(
            u, ff, env, legacy_freq_state=True, grad_mode="reference"),
        1000.0,
        StopSpec(r_floor=1.0, t_max=t_max),
    )
    uj = np.asarray(res.u[0])
    assert nat["status"] == events.MAX_PHASE_TIME
    assert int(res.status[0]) == events.MAX_PHASE_TIME
    np.testing.assert_allclose(nat["u"][:3], uj[:3], rtol=1e-6)
    assert nat["u"][3] == pytest.approx(uj[3], rel=1e-4)
    np.testing.assert_allclose(uj[:3], GOLD_LAT_BUDGET[:3], rtol=1e-6)
    assert uj[3] == pytest.approx(GOLD_LAT_BUDGET[3], rel=1e-4)


def test_golden_raymain_wedge_is_detected():
    """Past t = 40.36 RE config 1 wedges (dispersion singularity): the
    batch integrator must retire the ray as DT_UNDERFLOW rather than
    burning the whole step budget on no-op accepts (the CVODE
    step-size-failure semantics; memory: 'Zeno rays')."""
    env = make_env_raymain()
    res = _jax_trace(
        lambda u, ff: rhs.rhs_2d_colat(
            u, ff, env, legacy_freq_state=True, grad_mode="reference"),
        5000.0,
        StopSpec(r_floor=1.0, t_max=5.0e9 / RE, lat_sign=-1.0,
                 lat_offset=np.pi / 2),
    )
    assert int(res.status[0]) == events.DT_UNDERFLOW
    # wedge location is itself pinned
    assert float(res.t[0]) == pytest.approx(40.362, abs=0.05)
