"""Whistler observables: dispersion analysis of traced ensembles.

The reference traces rays; what whistler receivers actually measure is
the frequency-time curve of the arriving signal. For ducted/field-
aligned propagation below the nose frequency, the group delay follows
the Eckersley law

    T(f) ~ D0 / sqrt(f)

with the **dispersion** D0 = T sqrt(f) (s Hz^1/2) approximately constant
over the low-frequency band -- the single number whistler networks
report per event. This module turns the framework's multi-frequency
ensembles (T(f) comes straight from the traced group-delay state) into
those observables:

  - ``dispersion_measure``: per-ray D = T sqrt(f);
  - ``fit_eckersley``: least-squares D0 (+ residuals) over a
    frequency sweep of surface-hitting rays;
  - ``hop_delays``: group delays organized per (launch, frequency) --
    the one-hop whistler travel times whose multiples give the classic
    two-hop/echo-train periods.

Reference tie-in: the reference's planned frequency ensembles
(RayMain.jl:32-52) exist to produce exactly these curves; its group-
delay equation dT/dt = (1/c)(1 + (f/mu) dmu/df) (RayMain.jl:344) is the
quantity analyzed here.
"""

import numpy as np

from .integrate import events


def dispersion_measure(T, f):
    """Eckersley dispersion D = T sqrt(f) (s Hz^1/2) per ray."""
    return np.asarray(T) * np.sqrt(np.asarray(f))


def fit_eckersley(T, f, status=None):
    """Least-squares Eckersley fit over a frequency sweep.

    Model T(f) = D0 / sqrt(f). Returns dict with
      d0           -- fitted dispersion (s Hz^1/2),
      rms_rel      -- rms relative residual of T (how well the band obeys
                      the law; < ~0.1 in the classic low-band regime),
      n_used       -- rays in the fit (surface hits only when status
                      given).
    """
    T = np.asarray(T, np.float64)
    f = np.asarray(f, np.float64)
    keep = np.isfinite(T) & (T > 0)
    if status is not None:
        keep &= np.asarray(status) == events.HIT_EARTH
    T, f = T[keep], f[keep]
    if T.size == 0:
        return {"d0": np.nan, "rms_rel": np.nan, "n_used": 0}
    w = 1.0 / np.sqrt(f)
    # min over d0 of sum (T - d0 w)^2  ->  d0 = (w.T) / (w.w)
    d0 = float(np.dot(w, T) / np.dot(w, w))
    resid = T - d0 * w
    return {
        "d0": d0,
        "rms_rel": float(np.sqrt(np.mean((resid / T) ** 2))),
        "n_used": int(T.size),
    }


def hop_delays(result, f, valid=None, group_idx=-1):
    """One-hop travel times of the surface-hitting rays.

    Returns (f_hit, T_hit): the frequency and group delay of every valid
    ray that reached the conjugate surface -- the one-hop whistler; the
    n-hop echo train arrives at odd multiples (1, 3, 5, ...) x T for a
    source-side receiver and even multiples for the conjugate side.
    group_idx: index of the group-delay channel in the state (default:
    last)."""
    u = np.asarray(result.u)
    status = np.asarray(result.status)
    f = np.asarray(f)
    keep = status == events.HIT_EARTH
    if valid is not None:
        keep &= np.asarray(valid)
    return f[keep], u[keep, group_idx]
