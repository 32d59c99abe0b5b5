// Native float64 oracle for the whistler ray tracer.
//
// Plays the role Sundials CVODE plays for the Julia reference
// (RayMain.jl:387 and SURVEY.md section 2, N1): an independent,
// native-code adaptive integrator with event detection, used as
//   (a) a cross-language correctness oracle for the JAX paths (the
//       physics here is written from the published equations in raw
//       angular-frequency form -- a different algebra AND a different
//       language than the production ratio-form JAX code), and
//   (b) an honest single-ray CPU wall-clock baseline for bench.py
//       (a compiled integrator, like the CVODE the reference calls).
//
// Units match the JAX side: r in Earth radii, t = phase path in RE,
// T = group delay in seconds, f in Hz.
//
// Build: make -C native    (produces native/liboracle.so)
// Binding: raytrace_tpu/native.py (ctypes).

#include <cmath>
#include <cstdint>

namespace {

// physical constants (reference: RayMain.jl:110-116)
constexpr double C_LIGHT = 2.99792458e8;
constexpr double RE_M = 6.3712e6;
constexpr double Q_E = 1.602e-19;
constexpr double ME_KG = 9.1093e-31;
constexpr double MP_KG = 1.6726219e-27;
constexpr double EPS0 = 8.854e-12;
constexpr double PI = 3.14159265358979323846;

struct Env {
  double b0;          // T
  double iono_n0;     // cm^-3
  double iono_decay;  // 1/RE
  double iono_r0;     // RE
  double ps_weight;
  double lppi, lppo, ne_lppi;
  double ps_season, ps_trough;
  double de_weight;
  double duct_amp, duct_l0, duct_w;  // Gaussian L-shell density duct
  double eta_he, eta_o;              // He+/O+ fractions of n_e
  double ps_refill;                  // trough refill weight in [0, 1]
  double ps_refill_q;                // tau(L) ~ L^q exponent (0 = global)
  double ps_refill_lref;             // shell where ps_refill is exact
  // MLT-resolved plasmasphere (models/medium.py::mlt_ps_params):
  // longitude phi maps to local time; the plasmapause follows the
  // derived-LCE Fourier shape, the trough gets the smooth day-night
  // modulation. ps_mlt == 0 keeps the axisymmetric medium exactly.
  double ps_mlt;        // gate (0/1)
  double ps_mlt_a0;     // base MLT angle (eastward from noon), rad
  double ps_mlt_c[7];   // Fourier shape coeffs c0, c1, s1, c2, s2, c3, s3
  double ps_mlt_tamp;   // trough day-night half-amplitude
  double ps_mlt_c3;     // base-knee trough log10 density
  // day/night ionosphere blend (models/medium.py EnvParams.iono_mix):
  // ne_iono = mix * fit_a + (1 - mix) * fit_b, fit_b sharing iono_r0
  double iono_n0_b, iono_decay_b, iono_mix;
  // plasmasphere model selector: 0 = CA1992 3-branch, 1 = simplified
  // GCPM (models/plasmasphere.py::ne_gcpm_cm3)
  double ps_sel;
  double gcpm_ne0, gcpm_lscale, gcpm_bpow, gcpm_knee;
  // field model selector: 0 = centered axial dipole, 1 = tilted dipole
  // (models/dipole.py::b_vec_tilted), 2 = degree-3 IGRF truncation
  // (models/dipole.py::b_vec_igrf). Tilted/IGRF are 3D-frame models;
  // the density is organized by the tilted-frame magnetic latitude
  // (b_tilt/b_tilt_phi -- for IGRF the tilt of its degree-1 part).
  double b_sel;
  double b_tilt, b_tilt_phi;
  double igrf[15];      // Schmidt coefficients (nT), degrees 1-3
};

// env array protocol (raytrace_tpu/native.py::_env_array): 56 doubles in
// the struct's field order (the Fourier block is fixed at 7 slots and the
// IGRF block at 15; unused slots ride as zeros)
constexpr int ENV_DOUBLES = 56;

Env env_from(const double* v) {
  return Env{v[0],  v[1],  v[2],  v[3],  v[4],  v[5],  v[6],  v[7],  v[8],
             v[9],  v[10], v[11], v[12], v[13], v[14], v[15], v[16], v[17],
             v[18], v[19], v[20],
             {v[21], v[22], v[23], v[24], v[25], v[26], v[27]},
             v[28], v[29],
             v[30], v[31], v[32],
             v[33],
             v[34], v[35], v[36], v[37],
             v[38],
             v[39], v[40],
             {v[41], v[42], v[43], v[44], v[45], v[46], v[47], v[48],
              v[49], v[50], v[51], v[52], v[53], v[54], v[55]}};
}

// ---- environment (reference: RayTrace_lat.jl:66-84, plasmasphere.jl) ----

// effective CA1992 parameters at longitude phi for the MLT-resolved
// medium (models/medium.py::mlt_ps_params): derived-LCE Fourier shape
// for the plasmapause, branch-1/branch-2 continuity for ne_lppi/lppo,
// smooth periodic day-night trough modulation. Exact base values at
// phi = 0 by construction.
// the shared local-time structure of every MLT-resolved medium: the
// Fourier teardrop S(ang) and the day-night trough modulation (mirrors
// models/medium.py::_mlt_shape -- the CA1992 and GCPM models must
// never diverge in MLT structure)
void mlt_shape_at(const Env& e, double phi, double* shape,
                  double* trough) {
  double ang = e.ps_mlt_a0 + phi;
  double s = e.ps_mlt_c[0];
  for (int k = 1; k <= 3; k++)
    s += e.ps_mlt_c[2 * k - 1] * std::cos(k * ang) +
         e.ps_mlt_c[2 * k] * std::sin(k * ang);
  *shape = s;
  *trough = e.ps_trough +
            e.ps_mlt_tamp * (std::cos(ang) - std::cos(e.ps_mlt_a0));
}

void mlt_params(const Env& e, double phi, double* lppi, double* lppo,
                double* ne_lppi, double* trough) {
  double shape;
  mlt_shape_at(e, phi, &shape, trough);
  double li = e.lppi * shape;
  double g1i = (-0.3145 * li + 3.9043) +
               e.ps_season * std::exp((2.0 - li) / 1.5);
  *lppi = li;
  *ne_lppi = std::pow(10.0, g1i);
  *lppo = li + 0.1 * (g1i - e.ps_mlt_c3);
}

// effective GCPM parameters at longitude phi for the MLT-resolved
// medium (models/medium.py::mlt_gcpm_params): the knee center rides the
// same Fourier teardrop (lppo * S(ang), S(a0) == 1), the trough the
// same smooth day-night modulation. No continuity constants: the GCPM
// knee is a C-infinity blend.
void mlt_gcpm(const Env& e, double phi, double* lppo, double* trough) {
  double shape;
  mlt_shape_at(e, phi, &shape, trough);
  *lppo = e.lppo * shape;
}

double ne_total_m3(double r, double lat, const Env& e, double phi = 0.0) {
  double ne_i = e.iono_n0 * std::exp(-e.iono_decay * (r - e.iono_r0));
  if (e.iono_mix != 1.0) {
    // day/night fit blend (the MLT interpolation the reference planned,
    // plasmasphere.jl:110-113)
    double ne_b = e.iono_n0_b * std::exp(-e.iono_decay_b * (r - e.iono_r0));
    ne_i = e.iono_mix * ne_i + (1.0 - e.iono_mix) * ne_b;
  }
  double cl = std::cos(lat);
  double L = r / (cl * cl);
  if (e.ps_sel != 0.0) {
    // simplified GCPM (models/plasmasphere.py::ne_gcpm_cm3): exponential
    // decay in L times the dipole mirror ratio to the power bpow,
    // log-sigmoid-joined to the CA1992 trough at Lppo
    double lppo_e = e.lppo, trough_e = e.ps_trough;
    if (e.ps_mlt != 0.0) mlt_gcpm(e, phi, &lppo_e, &trough_e);
    double q2 = 1.0 + 3.0 * std::sin(lat) * std::sin(lat);
    double ln_m = 0.5 * std::log(q2) - 6.0 * std::log(cl);
    double ln_ps = std::log(e.gcpm_ne0) - (L - 2.0) / e.gcpm_lscale +
                   e.gcpm_bpow * ln_m;
    double Lsafe = std::max(L, 1e-6);
    double ln_tr = std::log(trough_e * std::exp(-4.5 * std::log(Lsafe)) +
                            (1.0 - std::exp((2.0 - L) / 10.0)));
    double w = 1.0 / (1.0 + std::exp(-(lppo_e - L) / e.gcpm_knee));
    double ne_p = std::exp(w * ln_ps + (1.0 - w) * ln_tr);
    if (e.duct_amp != 0.0) {
      double x = (L - e.duct_l0) / e.duct_w;
      ne_p *= 1.0 + e.duct_amp * std::exp(-0.5 * x * x);
    }
    if (e.de_weight > 0.5) {
      double rb = 7.37e6, T = 2500.0;
      double G = rb * (1.0 - rb / (r * RE_M));
      double S = 1.506 * T * (rb / 7370.0) * (rb / 7370.0);
      ne_p *= std::sqrt(std::exp(-G / S));
    }
    return (ne_i + e.ps_weight * ne_p) * 1.0e6;
  }
  double lppi = e.lppi, lppo = e.lppo, ne_lppi = e.ne_lppi,
         trough = e.ps_trough;
  if (e.ps_mlt != 0.0) mlt_params(e, phi, &lppi, &lppo, &ne_lppi, &trough);
  double ne_p;
  if (L <= lppi) {
    double log_ne = (-0.3145 * L + 3.9043) +
                    e.ps_season * std::exp((2.0 - L) / 1.5);
    ne_p = std::pow(10.0, log_ne);
  } else if (L <= lppo) {
    ne_p = ne_lppi * std::pow(10.0, (lppi - L) / 0.1);
  } else {
    ne_p = trough * std::pow(L, -4.5) +
           (1.0 - std::exp((2.0 - L) / 10.0));
    if (e.ps_refill != 0.0) {
      // density-level trough refilling: log-space blend toward the
      // saturated branch-1 profile (models/plasmasphere.py). With
      // ps_refill_q > 0 the weight is per-L (refill_weight: each shell
      // refills on its own tau ~ L^q clock; ps_refill applies exactly
      // at L = ps_refill_lref).
      double w = e.ps_refill;
      if (e.ps_refill_q != 0.0) {
        double ex = std::pow(e.ps_refill_lref / L, e.ps_refill_q);
        double keep = std::max(1.0 - w, 1e-30);
        w = 1.0 - std::pow(keep, ex);
      }
      double log_ne1 = (-0.3145 * L + 3.9043) +
                       e.ps_season * std::exp((2.0 - L) / 1.5);
      ne_p = std::exp((1.0 - w) * std::log(ne_p) +
                      w * log_ne1 * std::log(10.0));
    }
  }
  if (e.duct_amp != 0.0) {
    // field-aligned Gaussian duct (models/plasmasphere.py::duct_factor)
    double x = (L - e.duct_l0) / e.duct_w;
    ne_p *= 1.0 + e.duct_amp * std::exp(-0.5 * x * x);
  }
  if (e.de_weight > 0.5) {
    // diffusive equilibrium (plasmasphere.jl:96-106)
    double rb = 7.37e6, T = 2500.0;
    double G = rb * (1.0 - rb / (r * RE_M));
    double S = 1.506 * T * (rb / 7370.0) * (rb / 7370.0);
    ne_p *= std::sqrt(std::exp(-G / S));
  }
  return (ne_i + e.ps_weight * ne_p) * 1.0e6;
}

double b_mag(double r, double lat, const Env& e) {
  double s = std::sin(lat);
  return e.b0 * std::sqrt(1.0 + 3.0 * s * s) / (r * r * r);
}

// ---- 3D field models (models/dipole.py) ----

// (B_r, B_theta, B_phi) at geographic (r, theta, phi), dispatched on
// e.b_sel: centered axial dipole (RayTrace_3D.jl:54-66), tilted point
// dipole (b_vec_tilted), or the degree-3 IGRF truncation (b_vec_igrf;
// closed-form Schmidt P_nm, same 15-coefficient layout).
void b_vec_model(const Env& e, double r, double theta, double phi,
                 double* br, double* bt, double* bp) {
  double s = std::sin(theta), c = std::cos(theta);
  if (e.b_sel == 2.0) {
    const double* g = e.igrf;
    double g10 = g[0], g11 = g[1], h11 = g[2], g20 = g[3], g21 = g[4],
           h21 = g[5], g22 = g[6], h22 = g[7], g30 = g[8], g31 = g[9],
           h31 = g[10], g32 = g[11], h32 = g[12], g33 = g[13], h33 = g[14];
    double sp = std::sin(phi), cp = std::cos(phi);
    double s2p = 2.0 * sp * cp, c2p = cp * cp - sp * sp;
    double s3p = s2p * cp + c2p * sp, c3p = c2p * cp - s2p * sp;
    const double rt3 = 1.7320508075688772, rt6 = 2.449489742783178,
                 rt15 = 3.872983346207417, rt10 = 3.1622776601683795;
    double p10 = c, d10 = -s, p11 = s, d11 = c;
    double p20 = 1.5 * c * c - 0.5, d20 = -3.0 * s * c;
    double p21 = rt3 * s * c, d21 = rt3 * (c * c - s * s);
    double p22 = 0.5 * rt3 * s * s, d22 = rt3 * s * c;
    double p30 = 2.5 * c * c * c - 1.5 * c;
    double d30 = -1.5 * s * (5.0 * c * c - 1.0);
    double p31 = 0.25 * rt6 * s * (5.0 * c * c - 1.0);
    double d31 = 0.25 * rt6 * (c * (5.0 * c * c - 1.0) - 10.0 * c * s * s);
    double p32 = 0.5 * rt15 * s * s * c;
    double d32 = 0.5 * rt15 * (2.0 * s * c * c - s * s * s);
    double p33 = 0.25 * rt10 * s * s * s, d33 = 0.75 * rt10 * s * s * c;
    double inv_r = 1.0 / r;
    double f1 = inv_r * inv_r * inv_r, f2 = f1 * inv_r, f3 = f2 * inv_r;
    double t1 = g10 * p10 + (g11 * cp + h11 * sp) * p11;
    double dt1 = g10 * d10 + (g11 * cp + h11 * sp) * d11;
    double pt1 = (g11 * sp - h11 * cp) * p11;
    double t2 = g20 * p20 + (g21 * cp + h21 * sp) * p21 +
                (g22 * c2p + h22 * s2p) * p22;
    double dt2 = g20 * d20 + (g21 * cp + h21 * sp) * d21 +
                 (g22 * c2p + h22 * s2p) * d22;
    double pt2 = (g21 * sp - h21 * cp) * p21 +
                 2.0 * (g22 * s2p - h22 * c2p) * p22;
    double t3 = g30 * p30 + (g31 * cp + h31 * sp) * p31 +
                (g32 * c2p + h32 * s2p) * p32 + (g33 * c3p + h33 * s3p) * p33;
    double dt3 = g30 * d30 + (g31 * cp + h31 * sp) * d31 +
                 (g32 * c2p + h32 * s2p) * d32 + (g33 * c3p + h33 * s3p) * d33;
    double pt3 = (g31 * sp - h31 * cp) * p31 +
                 2.0 * (g32 * s2p - h32 * c2p) * p32 +
                 3.0 * (g33 * s3p - h33 * c3p) * p33;
    const double nt = 1.0e-9;
    *br = nt * (2.0 * f1 * t1 + 3.0 * f2 * t2 + 4.0 * f3 * t3);
    *bt = -nt * (f1 * dt1 + f2 * dt2 + f3 * dt3);
    *bp = nt / std::max(s, 1.0e-12) * (f1 * pt1 + f2 * pt2 + f3 * pt3);
    return;
  }
  if (e.b_sel == 1.0) {
    // tilted point dipole: B = (b0/r^3)(3 (m.rhat) rhat - m) on the
    // local spherical basis (models/dipole.py::b_vec_tilted)
    double st = std::sin(e.b_tilt), ct = std::cos(e.b_tilt);
    double mx = st * std::cos(e.b_tilt_phi), my = st * std::sin(e.b_tilt_phi),
           mz = -ct;
    double sp = std::sin(phi), cp = std::cos(phi);
    double m_r = mx * s * cp + my * s * sp + mz * c;
    double m_t = mx * c * cp + my * c * sp - mz * s;
    double m_p = -mx * sp + my * cp;
    double k = e.b0 / (r * r * r);
    *br = 2.0 * k * m_r;
    *bt = -k * m_t;
    *bp = -k * m_p;
    return;
  }
  double lat = PI / 2.0 - theta;
  double inv_r3 = 1.0 / (r * r * r);
  *br = -2.0 * e.b0 * inv_r3 * std::sin(lat);
  *bt = -e.b0 * inv_r3 * std::cos(lat);
  *bp = 0.0;
}

// magnetic latitude organizing the density models (models/medium.py::
// mlat_3d): geographic latitude for the centered dipole; the
// tilted-frame latitude for tilted/IGRF (for IGRF the tilt of its
// degree-1 part, marshalled into b_tilt/b_tilt_phi by make_env).
double mlat_of(const Env& e, double theta, double phi) {
  if (e.b_sel == 0.0) return PI / 2.0 - theta;
  double st = std::sin(e.b_tilt), ct = std::cos(e.b_tilt);
  double mx = st * std::cos(e.b_tilt_phi), my = st * std::sin(e.b_tilt_phi),
         mz = -ct;
  double s = std::sin(theta), c = std::cos(theta);
  double sl = -(mx * s * std::cos(phi) + my * s * std::sin(phi) + mz * c);
  sl = std::max(-1.0, std::min(1.0, sl));
  return std::asin(sl);
}

// magnetic longitude organizing the MLT axis of the density models
// (models/medium.py::mlon_3d / dipole.mlon_tilted): geographic phi for
// the centered dipole; otherwise the azimuth in the frame whose pole is
// the magnetic north axis, via the geodesic rotation
// Rz(phi0) Ry(-tilt) Rz(-phi0) (tilt -> 0 gives phi up to rounding).
double mlon_of(const Env& e, double theta, double phi) {
  if (e.b_sel == 0.0) return phi;
  double s = std::sin(e.b_tilt), c = std::cos(e.b_tilt);
  double s0 = std::sin(e.b_tilt_phi), c0 = std::cos(e.b_tilt_phi);
  double xm[3] = {c * c0 * c0 + s0 * s0, (c - 1.0) * s0 * c0, s * c0};
  double ym[3] = {(c - 1.0) * s0 * c0, c * s0 * s0 + c0 * c0, s * s0};
  double st = std::sin(theta), ct = std::cos(theta);
  double rx = st * std::cos(phi), ry = st * std::sin(phi), rz = ct;
  return std::atan2(ym[0] * rx + ym[1] * ry + ym[2] * rz,
                    xm[0] * rx + xm[1] * ry + xm[2] * rz);
}

// ---- dispersion (reference algebra: RayTrace_lat.jl:44-194) ----

// mu = sqrt(|mu2_plus|) and the reference's closed-form dmu/dpsi.
// Multi-ion: singly charged He+ (4 mp) / O+ (16 mp) fractions of n_e,
// protons carrying the rest (the reference is protons-only).
void mu_dmudpsi(double ne, double bm, double f, double psi, double* mu_out,
                double* dmudpsi_out, double* mu2_out,
                double eta_he = 0.0, double eta_o = 0.0) {
  double w = 2.0 * PI * f;
  double we2 = ne * Q_E * Q_E / (EPS0 * ME_KG);
  double oe = Q_E * bm / ME_KG;
  double R = 1.0 - (we2 / (w * w)) * (w / (w - oe));
  double L = 1.0 - (we2 / (w * w)) * (w / (w + oe));
  double P = 1.0 - we2 / (w * w);
  const double fracs[3] = {1.0 - eta_he - eta_o, eta_he, eta_o};
  const double mass[3] = {1.0, 4.0, 16.0};
  for (int i = 0; i < 3; i++) {
    if (fracs[i] == 0.0) continue;
    double wi2 = fracs[i] * ne * Q_E * Q_E / (EPS0 * MP_KG * mass[i]);
    double oi = Q_E * bm / (MP_KG * mass[i]);
    R -= (wi2 / (w * w)) * (w / (w + oi));
    L -= (wi2 / (w * w)) * (w / (w - oi));
    P -= wi2 / (w * w);
  }
  double D = 0.5 * (R - L), S = 0.5 * (R + L);
  double sp = std::sin(psi), cp = std::cos(psi);
  double s2 = sp * sp, c2 = cp * cp;
  double A = S * s2 + P * c2;
  double B = R * L * s2 + P * S * (1.0 + c2);
  double rlps = R * L - P * S;
  double F2 = rlps * rlps * s2 * s2 + 4.0 * std::pow(P * D * cp, 2);
  double F = std::sqrt(F2);
  double mu2 = (B + F) / (2.0 * A);
  double mu = std::sqrt(std::fabs(mu2));
  *mu_out = mu;
  *mu2_out = mu2;
  if (dmudpsi_out) {
    double dA = 2.0 * (S - P) * sp * cp;
    double dB = 2.0 * rlps * sp * cp;
    double dF = 1.0 / (2.0 * F) *
                (rlps * rlps * 4.0 * s2 * sp * cp -
                 8.0 * (P * D) * (P * D) * sp * cp);
    // reference form as written (RayMain.jl:252-254) -- NOT the true
    // derivative of sqrt(|mu2|); see ops/analytic.py
    *dmudpsi_out = 1.0 / (2.0 * mu) *
                   ((dB + dF) / (2.0 * A) - 2.0 * dA * (B + F) / (2.0 * A * A));
  }
}

double mu_2d_lat(double r, double lat, double chi, double f, const Env& e) {
  double dip = std::atan(2.0 * std::tan(lat));
  double psi = PI / 2.0 + dip + chi;
  double mu, mu2;
  mu_dmudpsi(ne_total_m3(r, lat, e), b_mag(r, lat, e), f, psi, &mu, nullptr,
             &mu2, e.eta_he, e.eta_o);
  return mu;
}

// ---- RHS (latitude frame, RayTrace_lat.jl:270-273) ----
// grad_mode is a bitfield:
//   bit 0 (GRAD_REFERENCE): closed-form dmu/dpsi + dmu/dr == 0 (the
//     reference's sub-ULP FD step), FD for lat/f; clear = "autodiff-
//     equivalent" (all partials relative-step central differences of the
//     traced mu, an independent check of autodiff).
//   bit 1 (LEGACY_FREQ): the 2D reference scripts initialize state[3] to
//     the frequency and integrate the group-delay equation into it, so
//     the frequency fed to the dispersion relation drifts by the
//     accumulated group delay (RayMain.jl:328 vs :344; SURVEY.md 3.1).
//     Here state[3] starts at 0 and freq_eff = f + u[3] -- identical
//     dynamics, same quirk.

void rhs_2d_lat(const double* u, double f0, const Env& e, int grad_mode,
                double* du) {
  double r = u[0], lat = u[1], chi = u[2];
  double f = (grad_mode & 2) ? f0 + u[3] : f0;
  double hr = 1e-7 * r, ha = 1e-7, hf = 1e-3 * f;
  double mu, mu2, dmudpsi_ref;
  double dip = std::atan(2.0 * std::tan(lat));
  double psi = PI / 2.0 + dip + chi;
  mu_dmudpsi(ne_total_m3(r, lat, e), b_mag(r, lat, e), f, psi, &mu,
             &dmudpsi_ref, &mu2, e.eta_he, e.eta_o);
  double dmudr, dmudlat, dmudpsi, dmudf;
  dmudlat = (mu_2d_lat(r, lat + ha / 2, chi, f, e) -
             mu_2d_lat(r, lat - ha / 2, chi, f, e)) / ha;
  dmudf = (mu_2d_lat(r, lat, chi, f + hf / 2, e) -
           mu_2d_lat(r, lat, chi, f - hf / 2, e)) / hf;
  if (grad_mode & 1) {
    dmudr = 0.0;
    dmudpsi = dmudpsi_ref;
  } else {
    dmudr = (mu_2d_lat(r + hr / 2, lat, chi, f, e) -
             mu_2d_lat(r - hr / 2, lat, chi, f, e)) / hr;
    dmudpsi = (mu_2d_lat(r, lat, chi + ha / 2, f, e) -
               mu_2d_lat(r, lat, chi - ha / 2, f, e)) / ha;
  }
  double sc = std::sin(chi), cc = std::cos(chi);
  double im2 = 1.0 / (mu * mu);
  du[0] = im2 * (mu * cc + dmudpsi * sc);
  du[1] = im2 / r * (mu * sc - dmudpsi * cc);
  du[2] = im2 / r * (dmudlat * cc - (r * dmudr + mu) * sc);
  du[3] = (RE_M / C_LIGHT) * (1.0 + (f / mu) * dmudf);
}

// ---- RHS (colatitude frame, RayMain.jl:341-344) ----
// state u = (r, theta, chi, T); dip(theta) == dip(lat = pi/2 - theta) so
// mu evaluates through the latitude helpers; the sign conventions of the
// colatitude Haselgrove form differ from the latitude form (C15 vs C16).

void rhs_2d_colat(const double* u, double f0, const Env& e, int grad_mode,
                  double* du) {
  double r = u[0], theta = u[1], chi = u[2];
  double f = (grad_mode & 2) ? f0 + u[3] : f0;
  double lat = PI / 2.0 - theta;
  double hr = 1e-7 * r, ha = 1e-7, hf = 1e-3 * f;
  double mu, mu2, dmudpsi_ref;
  double dip = std::atan(2.0 * std::tan(lat));
  double psi = PI / 2.0 + dip + chi;
  mu_dmudpsi(ne_total_m3(r, lat, e), b_mag(r, lat, e), f, psi, &mu,
             &dmudpsi_ref, &mu2, e.eta_he, e.eta_o);
  double dmudr, dmudtheta, dmudpsi, dmudf;
  // d/dtheta = -d/dlat
  dmudtheta = -(mu_2d_lat(r, lat + ha / 2, chi, f, e) -
                mu_2d_lat(r, lat - ha / 2, chi, f, e)) / ha;
  dmudf = (mu_2d_lat(r, lat, chi, f + hf / 2, e) -
           mu_2d_lat(r, lat, chi, f - hf / 2, e)) / hf;
  if (grad_mode & 1) {
    dmudr = 0.0;
    dmudpsi = dmudpsi_ref;
  } else {
    dmudr = (mu_2d_lat(r + hr / 2, lat, chi, f, e) -
             mu_2d_lat(r - hr / 2, lat, chi, f, e)) / hr;
    dmudpsi = (mu_2d_lat(r, lat, chi + ha / 2, f, e) -
               mu_2d_lat(r, lat, chi - ha / 2, f, e)) / ha;
  }
  double sc = std::sin(chi), cc = std::cos(chi);
  double im2 = 1.0 / (mu * mu);
  du[0] = im2 * (mu * cc - dmudpsi * sc);
  du[1] = im2 / r * (mu * sc + dmudpsi * cc);
  du[2] = im2 / r * (dmudtheta * cc - (r * dmudr + mu) * sc);
  du[3] = (RE_M / C_LIGHT) * (1.0 + (f / mu) * dmudf);
}

// ---- Dormand-Prince 5(4) with PI controller and surface event ----

constexpr double A21 = 0.2;
constexpr double A31 = 3.0 / 40.0, A32 = 9.0 / 40.0;
constexpr double A41 = 44.0 / 45.0, A42 = -56.0 / 15.0, A43 = 32.0 / 9.0;
constexpr double A51 = 19372.0 / 6561.0, A52 = -25360.0 / 2187.0,
                 A53 = 64448.0 / 6561.0, A54 = -212.0 / 729.0;
constexpr double A61 = 9017.0 / 3168.0, A62 = -355.0 / 33.0,
                 A63 = 46732.0 / 5247.0, A64 = 49.0 / 176.0,
                 A65 = -5103.0 / 18656.0;
constexpr double B1 = 35.0 / 384.0, B3 = 500.0 / 1113.0, B4 = 125.0 / 192.0,
                 B5 = -2187.0 / 6784.0, B6 = 11.0 / 84.0;
constexpr double E1 = 35.0 / 384.0 - 5179.0 / 57600.0;
constexpr double E3 = 500.0 / 1113.0 - 7571.0 / 16695.0;
constexpr double E4 = 125.0 / 192.0 - 393.0 / 640.0;
constexpr double E5 = -2187.0 / 6784.0 + 92097.0 / 339200.0;
constexpr double E6 = 11.0 / 84.0 - 187.0 / 2100.0;
constexpr double E7 = -1.0 / 40.0;

struct TraceOut {
  double u[4];
  double t;
  int32_t status;
  int32_t n_accept;
  int32_t n_reject;
};

// status codes match raytrace_tpu.integrate.events
enum { ACTIVE = 0, HIT_EARTH = 1, MAX_PHASE_TIME = 2, DT_UNDERFLOW = 7 };

template <int N>
void hermite(double tau, const double* u0, const double* k0, const double* u1,
             const double* k1, double dt, double* out) {
  double t2 = tau * tau, t3 = t2 * tau;
  double h00 = 2 * t3 - 3 * t2 + 1, h10 = t3 - 2 * t2 + tau;
  double h01 = -2 * t3 + 3 * t2, h11 = t3 - t2;
  for (int i = 0; i < N; i++)
    out[i] = h00 * u0[i] + h10 * dt * k0[i] + h01 * u1[i] + h11 * dt * k1[i];
}

void rhs_dispatch(int frame, const double* u, double f, const Env& e,
                  int grad_mode, double* du) {
  if (frame == 1) rhs_2d_colat(u, f, e, grad_mode, du);
  else rhs_2d_lat(u, f, e, grad_mode, du);
}

// DP5(4) + PI controller + surface event, templated on state dimension
// (N = 4 for the 2D frames, 7 for the 3D Kimura state). `rhs` is any
// callable (const double* u, double* du).
template <int N, typename RHS>
void trace_impl_n(RHS rhs, const double* u0, double rtol, double atol,
                  double t_max, double dt0, double dt_min, double dt_max,
                  int max_steps, double r_floor, double* u_out, double* t_out,
                  int32_t* st_out, int32_t* na_out, int32_t* nr_out) {
  double u[N], k1[N], k2[N], k3[N], k4[N], k5[N], k6[N], k7[N], utmp[N],
      unew[N];
  for (int i = 0; i < N; i++) u[i] = u0[i];
  rhs(u, k1);
  double t = 0.0, dt = dt0, errold = 1e-4;
  int na = 0, nr = 0;
  int32_t status = ACTIVE;
  for (int step = 0; step < max_steps && status == ACTIVE; step++) {
    double dte = dt;
    if (t + dte > t_max) dte = t_max - t;
    for (int i = 0; i < N; i++) utmp[i] = u[i] + dte * A21 * k1[i];
    rhs(utmp, k2);
    for (int i = 0; i < N; i++)
      utmp[i] = u[i] + dte * (A31 * k1[i] + A32 * k2[i]);
    rhs(utmp, k3);
    for (int i = 0; i < N; i++)
      utmp[i] = u[i] + dte * (A41 * k1[i] + A42 * k2[i] + A43 * k3[i]);
    rhs(utmp, k4);
    for (int i = 0; i < N; i++)
      utmp[i] = u[i] + dte * (A51 * k1[i] + A52 * k2[i] + A53 * k3[i] +
                              A54 * k4[i]);
    rhs(utmp, k5);
    for (int i = 0; i < N; i++)
      utmp[i] = u[i] + dte * (A61 * k1[i] + A62 * k2[i] + A63 * k3[i] +
                              A64 * k4[i] + A65 * k5[i]);
    rhs(utmp, k6);
    for (int i = 0; i < N; i++)
      unew[i] = u[i] + dte * (B1 * k1[i] + B3 * k3[i] + B4 * k4[i] +
                              B5 * k5[i] + B6 * k6[i]);
    rhs(unew, k7);
    double err = 0.0;
    for (int i = 0; i < N; i++) {
      double ei = dte * (E1 * k1[i] + E3 * k3[i] + E4 * k4[i] + E5 * k5[i] +
                         E6 * k6[i] + E7 * k7[i]);
      double sc = atol + rtol * std::max(std::fabs(u[i]), std::fabs(unew[i]));
      err += (ei / sc) * (ei / sc);
    }
    err = std::sqrt(err / N);
    bool accept = err <= 1.0;
    if (accept) {
      na++;
      double t1 = t + dte;
      if (unew[0] <= r_floor) {
        // bisection on the Hermite interpolant (matches the JAX path)
        double lo = 0.0, hi = 1.0, uu[N];
        double sign0 = (u[0] - r_floor) > 0 ? 1.0 : -1.0;
        for (int it = 0; it < 64; it++) {
          double mid = 0.5 * (lo + hi);
          hermite<N>(mid, u, k1, unew, k7, dte, uu);
          if (((uu[0] - r_floor) > 0 ? 1.0 : -1.0) == sign0) lo = mid;
          else hi = mid;
        }
        double tau = 0.5 * (lo + hi);
        hermite<N>(tau, u, k1, unew, k7, dte, uu);
        for (int i = 0; i < N; i++) u[i] = uu[i];
        t = t + tau * dte;
        status = HIT_EARTH;
        break;
      }
      for (int i = 0; i < N; i++) { u[i] = unew[i]; k1[i] = k7[i]; }
      t = t1;
      if (t >= t_max) { status = MAX_PHASE_TIME; break; }
      double eclip = std::max(err, 1e-10);
      double fac = 0.9 * std::pow(eclip, -0.7 / 5.0) *
                   std::pow(errold, 0.4 / 5.0);
      fac = std::min(5.0, std::max(0.2, fac));
      dt = std::min(dt_max, std::max(dt_min, dte * fac));
      errold = std::max(eclip, 1e-4);
    } else {
      nr++;
      double eclip = std::max(err, 1e-10);
      double fac = std::min(1.0, std::max(0.2, 0.9 * std::pow(eclip, -0.2)));
      dt = dte * fac;
      if (dt <= dt_min * (1.0 + 1e-6)) { status = DT_UNDERFLOW; break; }
    }
  }
  for (int i = 0; i < N; i++) u_out[i] = u[i];
  *t_out = t;
  *st_out = status;
  *na_out = na;
  *nr_out = nr;
}

void trace_2d_lat_impl(const double* u0, double f, const Env& e, int grad_mode,
                       double rtol, double atol, double t_max, double dt0,
                       double dt_min, double dt_max, int max_steps,
                       double r_floor, TraceOut* out, int frame = 0) {
  auto rhs = [&](const double* uu, double* dd) {
    rhs_dispatch(frame, uu, f, e, grad_mode, dd);
  };
  trace_impl_n<4>(rhs, u0, rtol, atol, t_max, dt0, dt_min, dt_max, max_steps,
                  r_floor, out->u, &out->t, &out->status, &out->n_accept,
                  &out->n_reject);
}

// ---- 3D (RayTrace_3D.jl): 7-state Kimura form ----
// state u = (r, theta, phi, rho_r, rho_theta, rho_phi, T); f a parameter
// (the RayTrace_3D.jl:334 convention -- no legacy freq quirk in 3D).

double mu_3d(double r, double theta, double phi, double rho_r, double rho_t,
             double rho_p, double f, const Env& e) {
  double br, bt, bp;
  b_vec_model(e, r, theta, phi, &br, &bt, &bp);
  double bmag = std::sqrt(br * br + bt * bt + bp * bp);
  double rmag = std::sqrt(rho_r * rho_r + rho_t * rho_t + rho_p * rho_p);
  double cospsi = (br * rho_r + bt * rho_t + bp * rho_p) / (bmag * rmag);
  cospsi = std::max(-1.0, std::min(1.0, cospsi));
  double psi = std::acos(cospsi);  // RayTrace_3D.jl:138-141
  double mlat = mlat_of(e, theta, phi);
  double mu, mu2;
  mu_dmudpsi(ne_total_m3(r, mlat, e, mlon_of(e, theta, phi)), bmag, f, psi,
             &mu, nullptr, &mu2, e.eta_he, e.eta_o);
  return mu;
}

// grad_mode bit 0 clear: every partial (r, theta, phi, rho_k, f) is a
// relative-step central difference of the traced mu. Bit 0 set
// ("reference"): dmu/dr == 0, rho partials via the Kimura chain driven by
// the reference's closed-form dmu/dpsi (RayTrace_3D.jl:261-311).
void rhs_3d(const double* u, double f, const Env& e, int grad_mode,
            double* du) {
  double r = u[0], theta = u[1], phi = u[2];
  double rho_r = u[3], rho_t = u[4], rho_p = u[5];
  double hr = 1e-7 * r, ha = 1e-7, hf = 1e-3 * f;
  double rmag = std::sqrt(rho_r * rho_r + rho_t * rho_t + rho_p * rho_p);
  double hro = 1e-8 * rmag;

  double mu = mu_3d(r, theta, phi, rho_r, rho_t, rho_p, f, e);
  double dmudtheta =
      (mu_3d(r, theta + ha / 2, phi, rho_r, rho_t, rho_p, f, e) -
       mu_3d(r, theta - ha / 2, phi, rho_r, rho_t, rho_p, f, e)) / ha;
  // axisymmetric medium: FD confirms d/dphi == 0 identically; the
  // MLT-resolved plasmasphere (density) or a tilted/IGRF field makes it
  // live
  double dmudphi =
      (e.ps_mlt != 0.0 || e.b_sel != 0.0)
          ? (mu_3d(r, theta, phi + ha / 2, rho_r, rho_t, rho_p, f, e) -
             mu_3d(r, theta, phi - ha / 2, rho_r, rho_t, rho_p, f, e)) / ha
          : 0.0;
  double dmudf = (mu_3d(r, theta, phi, rho_r, rho_t, rho_p, f + hf / 2, e) -
                  mu_3d(r, theta, phi, rho_r, rho_t, rho_p, f - hf / 2, e)) /
                 hf;
  double dmudr, dmudrr, dmudrt, dmudrp;
  if (grad_mode & 1) {
    dmudr = 0.0;
    // Kimura chain with the reference's closed-form dmu/dpsi
    double br, bt, bp;
    b_vec_model(e, r, theta, phi, &br, &bt, &bp);
    double bmag = std::sqrt(br * br + bt * bt + bp * bp);
    double cospsi = (br * rho_r + bt * rho_t + bp * rho_p) / (bmag * rmag);
    cospsi = std::max(-1.0, std::min(1.0, cospsi));
    double psi = std::acos(cospsi);
    double mu_ref, mu2, dmudpsi;
    mu_dmudpsi(ne_total_m3(r, mlat_of(e, theta, phi), e,
                           mlon_of(e, theta, phi)),
               bmag, f, psi, &mu_ref, &dmudpsi, &mu2, e.eta_he, e.eta_o);
    double sinpsi = std::sin(psi);
    auto sgn = [](double x) { return x > 0 ? 1.0 : (x < 0 ? -1.0 : 0.0); };
    double bk[3] = {br, bt, bp};
    double rho[3] = {rho_r, rho_t, rho_p};
    double out_k[3];
    for (int k = 0; k < 3; k++) {
      double cos_alpha = bk[k] * sgn(rho[k]) / bmag;
      out_k[k] = dmudpsi * (rho[k] * cospsi - mu_ref * cos_alpha) /
                 (mu_ref * mu_ref * sinpsi);
    }
    dmudrr = out_k[0];
    dmudrt = out_k[1];
    dmudrp = out_k[2];
  } else {
    dmudr = (mu_3d(r + hr / 2, theta, phi, rho_r, rho_t, rho_p, f, e) -
             mu_3d(r - hr / 2, theta, phi, rho_r, rho_t, rho_p, f, e)) / hr;
    dmudrr =
        (mu_3d(r, theta, phi, rho_r + hro / 2, rho_t, rho_p, f, e) -
         mu_3d(r, theta, phi, rho_r - hro / 2, rho_t, rho_p, f, e)) / hro;
    dmudrt =
        (mu_3d(r, theta, phi, rho_r, rho_t + hro / 2, rho_p, f, e) -
         mu_3d(r, theta, phi, rho_r, rho_t - hro / 2, rho_p, f, e)) / hro;
    dmudrp =
        (mu_3d(r, theta, phi, rho_r, rho_t, rho_p + hro / 2, f, e) -
         mu_3d(r, theta, phi, rho_r, rho_t, rho_p - hro / 2, f, e)) / hro;
  }
  // Haselgrove 3D assembly (RayTrace_3D.jl:350-356)
  double st = std::sin(theta), ct = std::cos(theta);
  double im2 = 1.0 / (mu * mu);
  double dr = im2 * (rho_r - mu * dmudrr);
  double dtheta = im2 / r * (rho_t - mu * dmudrt);
  double dphi = im2 / (r * st) * (rho_p - mu * dmudrp);
  du[0] = dr;
  du[1] = dtheta;
  du[2] = dphi;
  du[3] = dmudr / mu + rho_t * dtheta + rho_p * dphi * st;
  du[4] = (dmudtheta / mu - rho_t * dr + r * rho_p * dphi * ct) / r;
  du[5] = (dmudphi / mu - rho_p * dr * st - r * rho_p * dtheta * ct) /
          (r * st);
  du[6] = (RE_M / C_LIGHT) * (1.0 + (f / mu) * dmudf);
}

}  // namespace

extern "C" {

// batch evaluation of mu for parity tests
void rt_mu_2d_lat_batch(const double* r, const double* lat, const double* chi,
                        const double* f, int n, const double* env14,
                        double* mu_out) {
  Env e = env_from(env14);
  for (int i = 0; i < n; i++)
    mu_out[i] = mu_2d_lat(r[i], lat[i], chi[i], f[i], e);
}

void rt_rhs_2d_lat(const double* u, double f, const double* env14,
                   int grad_mode, double* du) {
  Env e = env_from(env14);
  rhs_2d_lat(u, f, e, grad_mode, du);
}

// full single-ray trace; out layout: [u0..u3, t, status, n_accept, n_reject]
// frame: 0 = latitude (RayTrace_lat), 1 = colatitude (RayMain)
void rt_trace_2d(const double* u0, double f, const double* env14,
                 int grad_mode, int frame, double rtol, double atol,
                 double t_max, double dt0, double dt_min, double dt_max,
                 int max_steps, double r_floor, double* out8) {
  Env e = env_from(env14);
  TraceOut o;
  trace_2d_lat_impl(u0, f, e, grad_mode, rtol, atol, t_max, dt0, dt_min,
                    dt_max, max_steps, r_floor, &o, frame);
  for (int i = 0; i < 4; i++) out8[i] = o.u[i];
  out8[4] = o.t;
  out8[5] = static_cast<double>(o.status);
  out8[6] = static_cast<double>(o.n_accept);
  out8[7] = static_cast<double>(o.n_reject);
}

void rt_trace_2d_lat(const double* u0, double f, const double* env14,
                     int grad_mode, double rtol, double atol, double t_max,
                     double dt0, double dt_min, double dt_max, int max_steps,
                     double r_floor, double* out8) {
  rt_trace_2d(u0, f, env14, grad_mode, 0, rtol, atol, t_max, dt0, dt_min,
              dt_max, max_steps, r_floor, out8);
}

void rt_rhs_2d_colat(const double* u, double f, const double* env14,
                     int grad_mode, double* du) {
  Env e = env_from(env14);
  rhs_2d_colat(u, f, e, grad_mode, du);
}

void rt_rhs_3d(const double* u, double f, const double* env14, int grad_mode,
               double* du) {
  Env e = env_from(env14);
  rhs_3d(u, f, e, grad_mode, du);
}

// batch evaluation of the 3D mu for parity tests (u = 7-state rows)
void rt_mu_3d_batch(const double* u, const double* f, int n,
                    const double* env14, double* mu_out) {
  Env e = env_from(env14);
  for (int i = 0; i < n; i++) {
    const double* ui = u + 7 * i;
    mu_out[i] = mu_3d(ui[0], ui[1], ui[2], ui[3], ui[4], ui[5], f[i], e);
  }
}

// full single-ray 3D trace; out layout: [u0..u6, t, status, n_accept,
// n_reject] (11 doubles)
void rt_trace_3d(const double* u0, double f, const double* env14,
                 int grad_mode, double rtol, double atol, double t_max,
                 double dt0, double dt_min, double dt_max, int max_steps,
                 double r_floor, double* out11) {
  Env e = env_from(env14);
  auto rhs = [&](const double* uu, double* dd) {
    rhs_3d(uu, f, e, grad_mode, dd);
  };
  double u[7], t;
  int32_t status, na, nr;
  trace_impl_n<7>(rhs, u0, rtol, atol, t_max, dt0, dt_min, dt_max, max_steps,
                  r_floor, u, &t, &status, &na, &nr);
  for (int i = 0; i < 7; i++) out11[i] = u[i];
  out11[7] = t;
  out11[8] = static_cast<double>(status);
  out11[9] = static_cast<double>(na);
  out11[10] = static_cast<double>(nr);
}

}  // extern "C"
