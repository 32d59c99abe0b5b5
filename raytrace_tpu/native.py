"""ctypes binding to the native float64 oracle (native/liboracle.so).

The native tier plays the role Sundials CVODE plays for the reference
(SURVEY.md section 2, N1): an independent compiled integrator used as a
correctness oracle and as the honest single-ray CPU baseline. Built on
demand with `make -C native` (g++; no external dependencies).
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liboracle.so")
_lib = None

GRAD_AUTODIFF_EQUIV = 0   # relative-step FD of the traced mu
GRAD_REFERENCE = 1        # reference closed-form dmu/dpsi + dmu/dr == 0
LEGACY_FREQ = 2           # OR-able flag: 2D freq drifts by the group delay
                          # (freq_eff = f + u[3]), the RayMain.jl:328/:344
                          # state quirk (SURVEY.md 3.1)


def ensure_built():
    """Build liboracle.so if missing; returns the loaded library."""
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "src", "oracle.cpp")
    stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if stale or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    d = ctypes.POINTER(ctypes.c_double)
    lib.rt_mu_2d_lat_batch.argtypes = [d, d, d, d, ctypes.c_int, d, d]
    lib.rt_rhs_2d_lat.argtypes = [d, ctypes.c_double, d, ctypes.c_int, d]
    lib.rt_trace_2d_lat.argtypes = [
        d, ctypes.c_double, d, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_double, d,
    ]
    lib.rt_trace_2d.argtypes = [
        d, ctypes.c_double, d, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_double, d,
    ]
    lib.rt_rhs_2d_colat.argtypes = [d, ctypes.c_double, d, ctypes.c_int, d]
    lib.rt_rhs_3d.argtypes = [d, ctypes.c_double, d, ctypes.c_int, d]
    lib.rt_mu_3d_batch.argtypes = [d, d, ctypes.c_int, d, d]
    lib.rt_trace_3d.argtypes = [
        d, ctypes.c_double, d, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_double, d,
    ]
    _lib = lib
    return lib


def _env_array(env):
    # explicit 56-double layout matching the C++ Env struct (oracle.cpp
    # env_from) -- independent of EnvParams field ordering. Features the
    # oracle does not implement are refused rather than silently dropped.
    if float(env.ps_smooth) != 0.0:
        raise ValueError(
            "native oracle implements the hard-branch plasmapause only; "
            f"got ps_smooth={float(env.ps_smooth)}"
        )
    if env.ps_model not in ("ca1992", "gcpm"):
        raise ValueError(
            "native oracle implements the CA1992/GCPM plasmaspheres only; "
            f"got ps_model={env.ps_model!r}"
        )
    if env.b_model not in ("dipole", "tilted", "igrf"):
        raise ValueError(
            f"native oracle: unknown b_model={env.b_model!r}"
        )
    # MLT-resolved plasmasphere block: the Fourier shape rides a fixed
    # 7-slot field (up to 3 harmonics; higher orders are refused)
    coeffs = tuple(float(c) for c in env.ps_mlt_c)
    if len(coeffs) > 7:
        raise ValueError(
            "native oracle implements <= 3 MLT shape harmonics; got "
            f"{(len(coeffs) - 1) // 2}"
        )
    coeffs = coeffs + (0.0,) * (7 - len(coeffs))
    igrf = tuple(float(c) for c in env.igrf_coeffs)
    if len(igrf) not in (0, 15):
        raise ValueError(
            "native oracle implements the degree-3 IGRF truncation "
            f"(15 Schmidt coefficients); got {len(igrf)}"
        )
    igrf = igrf + (0.0,) * (15 - len(igrf))
    b_sel = {"dipole": 0.0, "tilted": 1.0, "igrf": 2.0}[env.b_model]
    return np.asarray(
        [
            env.b0, env.iono_n0, env.iono_decay, env.iono_r0,
            env.ps_weight, env.lppi, env.lppo, env.ne_lppi,
            env.ps_season, env.ps_trough, env.de_weight,
            env.duct_amp, env.duct_l0, env.duct_w,
            env.eta_he, env.eta_o, env.ps_refill,
            env.ps_refill_q, env.ps_refill_lref,
            env.ps_mlt, env.ps_mlt_a0, *coeffs,
            env.ps_mlt_tamp, env.ps_mlt_c3,
            env.iono_n0_b, env.iono_decay_b, env.iono_mix,
            1.0 if env.ps_model == "gcpm" else 0.0,
            env.gcpm_ne0, env.gcpm_lscale, env.gcpm_bpow, env.gcpm_knee,
            b_sel, env.b_tilt, env.b_tilt_phi, *igrf,
        ],
        np.float64,
    )


def _require_dipole(env, what):
    # the tilted/IGRF fields break meridional symmetry; they are
    # 3D-frame-only media (same guard as models/medium.py)
    if env.b_model != "dipole":
        raise ValueError(
            f"native {what} is a 2D meridional-plane path; "
            f"b_model={env.b_model!r} is 3D-only"
        )


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def mu_2d_lat_batch(r, lat, chi, f, env):
    """Native mu over batched inputs (broadcast to a common shape)."""
    _require_dipole(env, "mu_2d_lat_batch")
    lib = ensure_built()
    r, lat, chi, f = np.broadcast_arrays(
        *[np.asarray(x, np.float64) for x in (r, lat, chi, f)]
    )
    r = np.ascontiguousarray(r.ravel())
    lat = np.ascontiguousarray(lat.ravel())
    chi = np.ascontiguousarray(chi.ravel())
    f = np.ascontiguousarray(f.ravel())
    out = np.empty_like(r)
    lib.rt_mu_2d_lat_batch(
        _ptr(r), _ptr(lat), _ptr(chi), _ptr(f), len(r),
        _ptr(_env_array(env)), _ptr(out),
    )
    return out


def rhs_2d_lat(u, f, env, grad_mode=GRAD_AUTODIFF_EQUIV):
    _require_dipole(env, "rhs_2d_lat")
    lib = ensure_built()
    u = np.ascontiguousarray(np.asarray(u, np.float64))
    du = np.empty(4, np.float64)
    lib.rt_rhs_2d_lat(_ptr(u), float(f), _ptr(_env_array(env)), grad_mode,
                      _ptr(du))
    return du


FRAME_LAT = 0
FRAME_COLAT = 1


def trace_2d(u0, f, env, *, frame=FRAME_LAT, grad_mode=GRAD_AUTODIFF_EQUIV,
             rtol=1e-7, atol=1e-12, t_max=np.inf, dt0=1e-4,
             dt_min=1e-8 / 6.3712e6, dt_max=1e6 / 6.3712e6,
             max_steps=100000, r_floor=1.0):
    """Single-ray native trace in either 2D frame;
    returns dict(u, t, status, n_accept, n_reject)."""
    _require_dipole(env, "trace_2d")
    lib = ensure_built()
    u0 = np.ascontiguousarray(np.asarray(u0, np.float64))
    out = np.empty(8, np.float64)
    lib.rt_trace_2d(
        _ptr(u0), float(f), _ptr(_env_array(env)), grad_mode, frame, rtol,
        atol, float(t_max), dt0, dt_min, dt_max, max_steps, r_floor,
        _ptr(out),
    )
    return {
        "u": out[:4].copy(),
        "t": float(out[4]),
        "status": int(out[5]),
        "n_accept": int(out[6]),
        "n_reject": int(out[7]),
    }


def trace_2d_lat(u0, f, env, **kw):
    return trace_2d(u0, f, env, frame=FRAME_LAT, **kw)


def rhs_2d_colat(u, f, env, grad_mode=GRAD_AUTODIFF_EQUIV):
    _require_dipole(env, "rhs_2d_colat")
    lib = ensure_built()
    u = np.ascontiguousarray(np.asarray(u, np.float64))
    du = np.empty(4, np.float64)
    lib.rt_rhs_2d_colat(_ptr(u), float(f), _ptr(_env_array(env)), grad_mode,
                        _ptr(du))
    return du


def mu_3d_batch(u, f, env):
    """Native 3D mu over batched 7-state rows (n, 7) and frequencies (n,)."""
    lib = ensure_built()
    u = np.ascontiguousarray(np.asarray(u, np.float64).reshape(-1, 7))
    f = np.ascontiguousarray(
        np.broadcast_to(np.asarray(f, np.float64), (len(u),))
    )
    out = np.empty(len(u), np.float64)
    lib.rt_mu_3d_batch(_ptr(u), _ptr(f), len(u), _ptr(_env_array(env)),
                       _ptr(out))
    return out


def rhs_3d(u, f, env, grad_mode=GRAD_AUTODIFF_EQUIV):
    lib = ensure_built()
    u = np.ascontiguousarray(np.asarray(u, np.float64))
    du = np.empty(7, np.float64)
    lib.rt_rhs_3d(_ptr(u), float(f), _ptr(_env_array(env)), grad_mode,
                  _ptr(du))
    return du


def trace_3d(u0, f, env, *, grad_mode=GRAD_AUTODIFF_EQUIV,
             rtol=1e-7, atol=1e-12, t_max=np.inf, dt0=1e-4,
             dt_min=1e-8 / 6.3712e6, dt_max=1e6 / 6.3712e6,
             max_steps=100000, r_floor=1.0):
    """Single-ray native 3D trace (7-state Kimura form);
    returns dict(u, t, status, n_accept, n_reject)."""
    lib = ensure_built()
    u0 = np.ascontiguousarray(np.asarray(u0, np.float64))
    out = np.empty(11, np.float64)
    lib.rt_trace_3d(
        _ptr(u0), float(f), _ptr(_env_array(env)), grad_mode, rtol, atol,
        float(t_max), dt0, dt_min, dt_max, max_steps, r_floor, _ptr(out),
    )
    return {
        "u": out[:7].copy(),
        "t": float(out[7]),
        "status": int(out[8]),
        "n_accept": int(out[9]),
        "n_reject": int(out[10]),
    }
