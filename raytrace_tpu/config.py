"""Run configuration: one JSON-serializable description of a whole run.

Replaces the reference's per-file copy-pasted globals and its never-built
RayParam.jl / ray_param.dat / ray_start.dat parameter files (README.md:8-12,
SURVEY.md section 5.6). A RunConfig fully determines a run: medium, solver,
stop conditions, launch grid, frame, precision, outputs.

The five canonical configs of BASELINE.json are provided as presets:
  raymain      -- RayMain.jl single whistler ray (2D colat, iono-only medium)
  lat_fan      -- RayTrace_lat.jl latitude/wave-normal fan (vmapped 2D)
  knee         -- adaptive DP5 rays through the plasmapause knee
  3d           -- RayTrace_3D.jl full 3D state
  ensemble10k  -- multi-frequency 10k+ ray ensemble, ICI-sharded
"""

import dataclasses
import json

import numpy as np

from .constants import B0_2D, B0_3D, RE
from .integrate import SolverConfig, StopSpec
from .models import make_env
from .models.ionosphere import IRI_DAYSIDE_FIT, TRACED_FIT
from .parallel.ensemble import LaunchSpec


@dataclasses.dataclass
class MediumConfig:
    b0: float = B0_3D
    iono_fit: str = "traced"        # "traced" | "iri_dayside"
    plasmasphere: bool = True
    kp_max: float = 3.0
    day: float = 0.0
    rbar: float = 90.0
    mlt: float = 2.0
    de_correction: bool = False
    ps_smooth: float = 0.0          # sigmoid plasmapause blend width (L)
    iono_mlt: bool = False          # day/night ionosphere blend by mlt
    ps_model: str = "ca1992"        # "ca1992" | "gcpm" (simplified GCPM,
                                    # models/plasmasphere.ne_gcpm_cm3)
    gcpm_bpow: float = 1.0          # GCPM mirror-ratio exponent
    gcpm_knee: float = 0.2          # GCPM plasmapause blend width (L)
    b_model: str = "dipole"         # "dipole" | "tilted" (3D frame only)
    b_tilt: float = 0.0             # moment tilt, rad
    b_tilt_phi: float = 0.0         # tilt azimuth, rad
    duct_amp: float = 0.0           # field-aligned duct: crest > 0 /
                                    # trough < 0 (plasmasphere.duct_factor)
    duct_l0: float = 3.0            # duct center, L
    duct_w: float = 0.1             # duct Gaussian width, L
    eta_he: float = 0.0             # He+ fraction of n_e (multi-ion)
    eta_o: float = 0.0              # O+ fraction of n_e
    ps_refill: float = 0.0          # trough refill weight in [0, 1]
    ps_refill_q: float = 0.0        # tau(L) ~ L^q exponent (0 = global
                                    # weight; ~4 = flux-tube-volume rates)
    ps_refill_lref: float = 4.0     # shell where ps_refill applies exactly
    ps_mlt: bool = False            # MLT-resolved plasmasphere (3D frame):
                                    # derived-LCE plasmapause shape + day-
                                    # night trough (medium.mlt_ps_params)
    ps_mlt_harmonics: int = 3       # Fourier harmonics of the shape
    ps_mlt_tamp: float = 1800.0     # trough day-night half-amplitude

    def build(self):
        fit = TRACED_FIT if self.iono_fit == "traced" else IRI_DAYSIDE_FIT
        return make_env(
            b0=self.b0, iono_fit=fit, plasmasphere_on=self.plasmasphere,
            kp_max=self.kp_max, day=self.day, rbar=self.rbar, mlt=self.mlt,
            de_correction=self.de_correction, ps_smooth=self.ps_smooth,
            iono_mlt=self.iono_mlt, ps_model=self.ps_model,
            gcpm_bpow=self.gcpm_bpow, gcpm_knee=self.gcpm_knee,
            b_model=self.b_model, b_tilt=self.b_tilt,
            b_tilt_phi=self.b_tilt_phi, duct_amp=self.duct_amp,
            duct_l0=self.duct_l0, duct_w=self.duct_w,
            eta_he=self.eta_he, eta_o=self.eta_o,
            ps_refill=self.ps_refill, ps_refill_q=self.ps_refill_q,
            ps_refill_lref=self.ps_refill_lref,
            ps_mlt=self.ps_mlt, ps_mlt_harmonics=self.ps_mlt_harmonics,
            ps_mlt_tamp=self.ps_mlt_tamp,
        )


@dataclasses.dataclass
class RunConfig:
    name: str = "run"
    frame: str = "2d_lat"           # "2d_lat" | "2d_colat" | "3d"
    medium: MediumConfig = dataclasses.field(default_factory=MediumConfig)
    # launch
    r0: float = (RE + 1.0e6) / RE
    lats: tuple = (np.pi / 4,)      # magnetic latitudes (rad) in EVERY
                                    # frame; colatitude frames convert to
                                    # theta = pi/2 - lat at launch build
    chis: tuple = (0.0,)
    phis: tuple = (0.0,)            # launch longitudes (rad), 3D frame
                                    # only -- fans the grid over MLT for
                                    # longitude-resolved media (ps_mlt).
                                    # 2D frames reject a non-default fan
                                    # (their state has no longitude).
    rays: tuple = ()                # explicit (lat, chi, freq[, r0]) rows;
                                    # non-empty overrides the lats x chis x
                                    # freqs grid (the reference's planned
                                    # ray_start.dat input, README.md:11)
    freqs: tuple = (1000.0,)
    rho0: tuple = (1.0, 1.0, 0.0)   # 3D initial refractive-index vector
    rho_on_shell: bool = False      # 3D frame: treat rho0 as a DIRECTION
                                    # and launch at mu(psi) * rho0_hat --
                                    # ON the dispersion surface
                                    # (ops.dispersion.consistent_rho_3d).
                                    # Default False mirrors the
                                    # reference's off-shell launch
                                    # rho0 = (1,1,0), |rho0| = sqrt(2) ~
                                    # 100x off the local mu
                                    # (RayTrace_3D.jl:390-391; fallout in
                                    # docs/NOTE_3D_GROUP_DELAY.md)
    # solver
    rtol: float = 1.0e-7
    atol: float = 1.0e-12
    dt0: float = 1.0e-4
    adaptive: bool = True
    stepper: str = "auto"           # "auto" (rounds tracer switches
                                    # base <-> ros3pr per ray on rejection
                                    # bursts, like CVODE's method choice)
                                    # | "dopri5" | "bs3" | "heun2" |
                                    # "ros2" | "ros2x" | "ros3pr"
                                    # | "ros4x";
                                    # non-rounds paths resolve "auto"
                                    # to dopri5
    max_steps: int = 20000
    dt_max: float = 1.0e6 / RE      # phase-path step ceiling (reference
                                    # dtmax = 1e6 m, RayTrace_lat.jl:338)
    ds_max: float = 0.0             # arc-length step ceiling (RE units);
                                    # 0 keeps the pure phase ceiling. The
                                    # principled production setting is
                                    # ds_max ~ the medium's gradient
                                    # length (~0.1 RE: plasmapause knee
                                    # 0.1 L, ionosphere scale height
                                    # 0.24 RE) with dt_max raised -- see
                                    # SolverConfig.ds_max and
                                    # benchmarks/perf_r03f.json
    ds_local: bool = False          # L-dependent LOCAL arc ceiling: tight
                                    # (ds_local_w) only near the
                                    # plasmapause knee shell (L from
                                    # medium.lppo at build time), opening
                                    # to r/4.5 over the smooth plasmasphere
                                    # -- SolverConfig.ds_local_knee. Any
                                    # ds_max > 0 stays as an outer clamp.
    ds_local_frac: float = 1.0
    ds_local_w: float = 0.1
    base_stepper: str = "dopri5"    # auto mode's non-stiff pool method;
                                    # "bs3" halves the stage cost per
                                    # attempt (the headline ensemble rides
                                    # dt_max, so the order drop costs ~5%
                                    # more steps for ~1.7x wall --
                                    # benchmarks/perf_r03b.json)
    grad_mode: str = "fused"
    wave_mode: str = "whistler"     # "whistler" (+ root) | "emic" (- root)
    # stop conditions
    t_max: float = 5.0e9 / RE
    r_floor: float = 1.0
    r_ceil: float = float("inf")
    group_time_max: float = float("inf")
    stop_at_equator: bool = False
    stop_evanescent: bool = False   # retire rays the moment their group
                                    # delay runs BACKWARD (the abs(mu^2)
                                    # evanescent-tracing regime) as
                                    # status EVANESCENT instead of
                                    # integrating a non-propagating
                                    # branch to a budget stop. Off by
                                    # default: reference parity.
    # execution
    dtype: str = "float32"          # "float32" (TPU) | "float64" (CPU oracle)
    use_rounds: bool = True         # bucketed re-batching
    round_steps: tuple = ()         # rounds-tracer schedule override
                                    # (empty = tracer default). Workload-
                                    # tuned on chip: short early rounds
                                    # pay off when most rays retire fast
                                    # (the 3D headline's median ray takes
                                    # ~270 attempts -> (512, 1024, 2048)
                                    # runs 2.3x faster than the 2D
                                    # headline's (2048, 2048, 1024))
    continue_until_done: bool = False
                                    # rounds path: if any ray retires as
                                    # MAX_STEPS (budget exhausted, still
                                    # integrable), chain up to
                                    # max_continuations extra full-budget
                                    # trace calls from the returned carry
                                    # (exact by construction -- the resume
                                    # is bitwise-identical to an
                                    # uninterrupted run, test_mr.py). The
                                    # continuation runs the fixed base
                                    # method over the whole padded batch
                                    # (the tail is tiny; re-bucketing
                                    # cannot pay for itself there).
    max_continuations: int = 4
    save_every: int = 0             # >0: record trajectory snapshots
    save_diagnostics: bool = False  # also record (mu, dmudpsi, dip, psi)
    sensitivity_rays: int = 0       # >0: landing-sensitivity analysis
                                    # (event-projected variational
                                    # Jacobian, sensitivity.py) for the
                                    # first N valid rays; amplification
                                    # lands in stats + the run record

    @property
    def root(self):
        return 1.0 if self.wave_mode == "whistler" else -1.0

    def solver(self):
        rtol, atol = self.rtol, self.atol
        if self.dtype == "float32":
            # float32's embedded error estimator bottoms out around
            # 10 * eps relative; requesting less (e.g. the reference's
            # CVODE reltol 1e-7) cannot improve accuracy and manufactures
            # rejection storms instead (measured: 53% rejection on the
            # knee preset at 1e-7/f32 vs 18% at the floor). The oracle
            # tolerances are honored on float64 runs.
            rtol = max(rtol, 1.2e-6)
            atol = max(atol, 1.0e-9)
        # the local arc ceiling is anchored to the medium's own sharp
        # shells: the pre-solved CA1992 plasmapause, plus the duct (a
        # duct_w-wide feature is exactly as sharp as the knee)
        knee, shells = 0.0, ()
        if self.ds_local:
            knee = float(self.medium.build().lppo)
            if self.medium.duct_amp != 0.0:
                shells = ((self.medium.duct_l0, self.medium.duct_w),)
        return SolverConfig(
            rtol=rtol, atol=atol, dt0=self.dt0,
            dt_max=self.dt_max, ds_max=self.ds_max,
            ds_local_knee=knee, ds_local_frac=self.ds_local_frac,
            ds_local_w=self.ds_local_w, ds_local_shells=shells,
        )

    def stop(self):
        lat_sign, lat_offset = (
            (1.0, 0.0) if self.frame == "2d_lat" else (-1.0, np.pi / 2)
        )
        return StopSpec(
            r_floor=self.r_floor, r_ceil=self.r_ceil, t_max=self.t_max,
            group_time_max=self.group_time_max,
            stop_at_equator=1.0 if self.stop_at_equator else 0.0,
            lat_sign=lat_sign, lat_offset=lat_offset,
            stop_retrograde=1.0 if self.stop_evanescent else 0.0,
        )

    def launch(self):
        return LaunchSpec(
            r0=self.r0, lats=tuple(self.lats), chis=tuple(self.chis),
            freqs=tuple(self.freqs),
        )

    def to_json(self, path=None):
        d = dataclasses.asdict(self)
        s = json.dumps(d, indent=2, default=list)
        if path:
            with open(path, "w") as fh:
                fh.write(s)
        return s

    @classmethod
    def from_json(cls, src):
        if isinstance(src, str) and src.lstrip().startswith("{"):
            d = json.loads(src)
        else:
            with open(src) as fh:
                d = json.load(fh)
        med = MediumConfig(**d.pop("medium", {}))
        for key in ("lats", "chis", "phis", "freqs", "rho0"):
            if key in d:
                d[key] = tuple(d[key])
        if "rays" in d:
            d["rays"] = tuple(tuple(r) for r in d["rays"])
        return cls(medium=med, **d)


def preset(name, **overrides):
    """Named configs: the five canonical BASELINE.json workloads plus
    the framework-extension presets (production ceilings, 3D ensemble,
    EMIC, storm, ducts, ...)."""
    presets = {
        # config 1: RayMain.jl single ray (RayMain.jl:382-387)
        "raymain": dict(
            name="raymain", frame="2d_colat",
            medium=MediumConfig(b0=B0_2D, plasmasphere=False),
            lats=(np.pi / 4,), chis=(0.0,), freqs=(5000.0,),
        ),
        # config 2: RayTrace_lat.jl fan (RayTrace_lat.jl:333-338)
        "lat_fan": dict(
            name="lat_fan", frame="2d_lat",
            medium=MediumConfig(b0=B0_2D),
            lats=tuple(np.linspace(0.5, 1.0, 16)),
            chis=tuple(np.linspace(-0.3, 0.3, 8)),
            freqs=(1000.0,),
        ),
        # config 3: adaptive rays through the plasmapause knee --
        # launch fans that traverse L ~ Lppi..Lppo
        "knee": dict(
            name="knee", frame="2d_lat",
            medium=MediumConfig(b0=B0_2D),
            lats=tuple(np.linspace(0.9, 1.15, 16)),
            chis=tuple(np.linspace(-0.2, 0.2, 8)),
            freqs=(500.0, 1000.0, 2000.0),
        ),
        # config 4: RayTrace_3D.jl (RayTrace_3D.jl:390-395)
        "3d": dict(
            name="3d", frame="3d",
            medium=MediumConfig(b0=B0_3D),
            lats=(np.pi / 4,), freqs=(1000.0,), rho0=(1.0, 1.0, 0.0),
        ),
        # config 5: the 10k multi-frequency ensemble (headline bench).
        # auto stepping over the BS3 base: the ensemble rides dt_max
        # (median accepted dt = 0.985 dt_max, perf_r03.json), so the
        # half-cost 3(2) pair wins 1.7x wall at the same tolerance
        # contract; the stiff pool (ros3pr) is unchanged.
        "ensemble10k": dict(
            name="ensemble10k", frame="2d_lat",
            medium=MediumConfig(b0=B0_2D),
            lats=tuple(np.linspace(0.45, 1.1, 40)),
            chis=tuple(np.linspace(-0.5, 0.5, 16)),
            freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
            rtol=1.0e-5, atol=1.0e-8, base_stepper="bs3",
        ),
        # the headline workload at the PRODUCTION ceiling setting: arc
        # ceiling at 2e6 m (spatial resolution tied to the medium's
        # gradient scale -- SolverConfig.ds_max) with the phase ceiling
        # relaxed to 8e6 m as the outer bound. Measured vs the
        # reference-ceiling headline (benchmarks/perf_r03h.json):
        # 3.8x fewer attempted steps (5.65M vs 21.5M), wall 0.39 s vs
        # 0.56-0.62 s on the dispatch-bound tunnel (compute-bound
        # hardware gains the full step ratio), landing medians inside
        # the rtol-1e-5 noise floor. ensemble10k itself keeps the
        # reference's dtmax = 1e6 m for workload comparability.
        "ensemble10k_production": dict(
            name="ensemble10k_production", frame="2d_lat",
            medium=MediumConfig(b0=B0_2D),
            lats=tuple(np.linspace(0.45, 1.1, 40)),
            chis=tuple(np.linspace(-0.5, 0.5, 16)),
            freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
            rtol=1.0e-5, atol=1.0e-8, base_stepper="bs3",
            ds_max=2.0e6 / RE, dt_max=8.0e6 / RE,
        ),
        # the production workload on the LOCAL arc ceiling: spatial
        # resolution follows the medium's own gradient-length profile
        # (tight only within ds_local_w of the plasmapause shell,
        # opening to r/4.5 over the smooth plasmasphere) instead of the
        # one global ds_max sized for the knee. Phase ceiling stays the
        # 8e6 m outer bound; no global ds_max clamp.
        "ensemble10k_local": dict(
            name="ensemble10k_local", frame="2d_lat",
            medium=MediumConfig(b0=B0_2D),
            lats=tuple(np.linspace(0.45, 1.1, 40)),
            chis=tuple(np.linspace(-0.5, 0.5, 16)),
            freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
            rtol=1.0e-5, atol=1.0e-8, base_stepper="bs3",
            ds_local=True, dt_max=8.0e6 / RE,
        ),
        # 3D knee stress: 7-state rays launched so their trajectories
        # traverse L ~ Lppi..Lppo (the plasmapause gradient region that
        # drives DP5 rejection bursts and the auto-mode stiff pool --
        # with the 7x7 unpivoted W-solve, steppers._solve_nopivot).
        "knee_3d": dict(
            name="knee_3d", frame="3d",
            medium=MediumConfig(b0=B0_3D),
            lats=tuple(np.linspace(0.9, 1.15, 12)),
            freqs=(500.0, 1000.0, 2000.0),
            rho0=(1.0, 1.0, 0.0),
            rtol=1.0e-5, atol=1.0e-8,
        ),
        # 3D production ensemble: 1,024 seven-state rays launched ON the
        # dispersion surface (rho_on_shell -- the physical launch; the
        # reference's own 3D script launches off-shell, see rho_on_shell
        # doc above) at the production arc ceiling. The at-scale 3D
        # story: benchmarks/perf_r03j.py measures this workload on chip.
        "ensemble3d": dict(
            name="ensemble3d", frame="3d",
            medium=MediumConfig(b0=B0_3D),
            lats=tuple(np.linspace(0.45, 1.1, 64)),
            freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
            rho0=(1.0, 1.0, 0.0), rho_on_shell=True,
            rtol=1.0e-5, atol=1.0e-8,
            ds_max=2.0e6 / RE, dt_max=8.0e6 / RE,
        ),
        # the 3D PRODUCTION HEADLINE: a 10,240-ray 7-state ensemble
        # (lat x chi x freq fan; chi rotates the launch wave-normal
        # direction within the meridional plane around the reference's
        # rho0 = (1,1,0), run._build_u0) launched ON the dispersion
        # surface at the production arc ceiling -- the at-scale 3D row
        # next to ensemble10k (VERDICT r3 #1). Workload shape mirrors
        # the 2D headline (40 x 16 x 16); the 7-state frame pays 12
        # dispersion evals/RHS in the reference
        # (RayTrace_3D.jl:336-344), one fused eval here.
        "ensemble10k_3d": dict(
            name="ensemble10k_3d", frame="3d",
            medium=MediumConfig(b0=B0_3D),
            lats=tuple(np.linspace(0.45, 1.1, 40)),
            chis=tuple(np.linspace(-0.5, 0.5, 16)),
            freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
            rho0=(1.0, 1.0, 0.0), rho_on_shell=True,
            rtol=1.0e-5, atol=1.0e-8, base_stepper="bs3",
            ds_max=2.0e6 / RE, dt_max=8.0e6 / RE,
            # on-chip-tuned schedule (benchmarks/perf_r04_3d.json): the
            # median 3D ray retires in ~270 attempts, so short early
            # rounds re-bucket the fan fast -- 0.177 s vs 0.41 s on the
            # 2D headline's (2048, 2048, 1024)
            round_steps=(512, 1024, 2048),
        ),
        # the 3D headline through the MLT-RESOLVED (longitude-dependent)
        # plasmasphere: the launch fan spreads over all local times, so
        # rays sample the drift-derived dusk plume (convection.lppi_at_mlt
        # as a smooth Fourier shape; the reference freezes MLT to a
        # scalar, RayTrace_3D.jl:114). Same ray count / solver settings
        # as ensemble10k_3d for a like-for-like cost comparison of the
        # d mu/d phi medium chain at production scale.
        "ensemble10k_plume": dict(
            name="ensemble10k_plume", frame="3d",
            medium=MediumConfig(b0=B0_3D, ps_mlt=True),
            lats=tuple(np.linspace(0.45, 1.1, 10)),
            phis=tuple(np.linspace(-np.pi, np.pi, 8, endpoint=False)),
            chis=tuple(np.linspace(-0.5, 0.5, 8)),
            freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
            rho0=(1.0, 1.0, 0.0), rho_on_shell=True,
            rtol=1.0e-5, atol=1.0e-8, base_stepper="bs3",
            ds_max=2.0e6 / RE, dt_max=8.0e6 / RE,
            round_steps=(512, 1024, 2048),
        ),
        # framework extension: a magnetospherically-reflecting fan --
        # the extreme-straggler workload (unducted low-frequency
        # whistlers launched oblique near the equator mirror at the
        # f = f_LHR surface instead of landing, tests/test_mr.py, and
        # live for many bounces before landing or exhausting a budget).
        # The opposite load shape from the headline fans: the median ray
        # integrates 5-10x the headline's median step count (multi-
        # bounce paths, group delays of seconds), stressing sustained
        # per-step throughput rather than re-bucketing.
        "mr_fan": dict(
            name="mr_fan", frame="2d_lat",
            medium=MediumConfig(),
            r0=2.5,
            lats=tuple(np.linspace(0.0, 0.5, 16)),
            chis=tuple(np.linspace(-0.9, -0.3, 8)),
            freqs=tuple(np.geomspace(600.0, 1200.0, 16)),
            group_time_max=10.0, t_max=6.0e10 / RE, max_steps=40960,
            ds_max=2.0e6 / RE, dt_max=8.0e6 / RE, base_stepper="bs3",
        ),
        # the plume fan on a TILTED dipole (b_model="tilted"; the realis-
        # tic ~11.5 deg moment tilt): the full ps_mlt x tilted composit-
        # ion at production scale -- the MLT axis rides the MAGNETIC
        # longitude (medium.mlon_3d) and the gradient chain runs through
        # the general hybrid fused chain (ops/fused.py::
        # mu_and_grads_3d_general). Same fan/solver settings as
        # ensemble10k_plume for a like-for-like cost comparison.
        # Match: RayTrace_3D.jl:54-66 (the field model the 3D frame owns).
        "ensemble10k_tilted": dict(
            name="ensemble10k_tilted", frame="3d",
            medium=MediumConfig(b0=B0_3D, ps_mlt=True, b_model="tilted",
                                b_tilt=0.2, b_tilt_phi=0.5),
            lats=tuple(np.linspace(0.45, 1.1, 10)),
            phis=tuple(np.linspace(-np.pi, np.pi, 8, endpoint=False)),
            chis=tuple(np.linspace(-0.5, 0.5, 8)),
            freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
            rho0=(1.0, 1.0, 0.0), rho_on_shell=True,
            rtol=1.0e-5, atol=1.0e-8, base_stepper="bs3",
            ds_max=2.0e6 / RE, dt_max=8.0e6 / RE,
            round_steps=(512, 1024, 2048),
        ),
        # the same fan on the degree-3 IGRF truncation (the most
        # expensive traced field: spherical harmonics per B evaluation)
        "ensemble10k_igrf": dict(
            name="ensemble10k_igrf", frame="3d",
            medium=MediumConfig(b0=B0_3D, ps_mlt=True, b_model="igrf"),
            lats=tuple(np.linspace(0.45, 1.1, 10)),
            phis=tuple(np.linspace(-np.pi, np.pi, 8, endpoint=False)),
            chis=tuple(np.linspace(-0.5, 0.5, 8)),
            freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
            rho0=(1.0, 1.0, 0.0), rho_on_shell=True,
            rtol=1.0e-5, atol=1.0e-8, base_stepper="bs3",
            ds_max=2.0e6 / RE, dt_max=8.0e6 / RE,
            round_steps=(512, 1024, 2048),
        ),
        # framework extension: magnetospheric reflection in the 7-state
        # Kimura frame over the MLT-RESOLVED medium -- the Bortnik-
        # thesis behavior the reference's 3D script cites
        # (RayTrace_3D.jl:5) in the frame where it matters physically:
        # low-altitude mid-latitude launches whose near-field-aligned
        # wave normals rotate toward the resonance cone, mirror on the
        # f = f_LHR surface (tests/test_mr3d.py: oracle-confirmed
        # bounce-for-bounce) and DRIFT in longitude through the dusk
        # plume (d mu/d phi != 0 steers rays across local time; the
        # escape subpopulation crosses >1 rad of longitude). The MR band
        # itself moves with MLT (a (lat0, chi, f) cell that bounces at
        # dawn can land at dusk -- measured, r05), so the fan spreads
        # over all 8 sectors. Same 2,048-ray count and budget semantics
        # as the 2D mr_fan for a like-for-like census.
        "mr_fan_3d": dict(
            name="mr_fan_3d", frame="3d",
            medium=MediumConfig(b0=B0_3D, ps_mlt=True),
            lats=tuple(np.linspace(0.95, 1.2, 8)),
            phis=tuple(np.linspace(-np.pi, np.pi, 8, endpoint=False)),
            chis=tuple(np.linspace(-0.3, 0.1, 4)),
            freqs=tuple(np.geomspace(700.0, 1600.0, 8)),
            rho0=(1.0, 0.0, 0.0), rho_on_shell=True,
            rtol=1.0e-6, atol=1.0e-10, base_stepper="bs3",
            dt_max=1.0e6 / RE,
            group_time_max=10.0, t_max=6.0e10 / RE, max_steps=40960,
        ),
        # framework extension: He+-band EMIC rays in a multi-ion plasma
        # (the '-' root the reference left commented out, RayMain.jl:243,
        # in the composition that gives it its real band structure).
        # Equatorial launches just below the local He+ gyrofrequency
        # (fc_He ~ 1.9 Hz at L = 2 for the 2D-legacy B0).
        "emic_heband": dict(
            name="emic_heband", frame="2d_lat", wave_mode="emic",
            medium=MediumConfig(b0=B0_2D, eta_he=0.1, eta_o=0.02),
            r0=2.0,
            lats=tuple(np.linspace(-0.1, 0.1, 8)),
            chis=(0.0, 0.2),
            freqs=(1.0, 1.4, 1.8),
            t_max=200.0, max_steps=8000,
        ),
    }
    if name not in presets:
        raise KeyError(
            f"unknown preset {name!r}; available: {sorted(presets)}"
        )
    d = presets[name]
    d.update(overrides)
    return RunConfig(**d)
