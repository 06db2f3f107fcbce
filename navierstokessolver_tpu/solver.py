"""Chorin projection time stepper: predictor -> Poisson -> corrector.

Capability parity: the reference's time-step driver (SURVEY.md SS3.1 call
stack): explicit advection-diffusion predictor, pressure Poisson solve,
velocity correction, BC re-application, periodic output. TPU-first design:
the whole step is pure-functional; ``run_scan`` wraps N steps in one
jit-compiled ``lax.scan`` with zero host round-trips (BASELINE.json north
star), and the pressure from step k warm-starts the Poisson solve at k+1.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import bcs as bcs_mod
from .bcs import BCTable
from .grid import GridSpec, State, zero_state
from .ops import poisson as poisson_mod
from .ops import stencils
from .ops.poisson import PoissonConfig, PoissonOp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Static physical/numerical parameters of a run."""

    dt: float
    nu: float
    rho: float = 1.0
    upwind_gamma: float = 0.0
    poisson: PoissonConfig = dataclasses.field(default_factory=PoissonConfig)
    # Time integrator: "euler" (reference-style explicit first order) or
    # "rk2" (midpoint rule, one projection per stage, second order in time).
    # SURVEY.md SS0.3 parks the reference's integrator order as unknown.
    integrator: str = "euler"
    # Use the fused Pallas predictor kernels (2D/3D float32, unsharded
    # runs). None = auto: on for the TPU backend (measured: the fused 3D
    # predictor cuts ~6 ms/step of XLA-materialized intermediates at 256^3
    # to ~1; the 2D kernel matches XLA), off elsewhere.
    use_pallas: Optional[bool] = None
    # CFL-adaptive stepping: when set, each step uses
    # dt_k = min(dt, cfl * min_a(h_a / max|u_a|)) computed on device
    # (`dt` then acts as the cap / diffusive limit). None = fixed dt.
    cfl: Optional[float] = None


class StepDiagnostics(NamedTuple):
    poisson_iters: Array   # iterations the pressure solve took
    poisson_res: Array     # final relative residual
    max_div: Array         # max |div u| after projection
    max_cfl: Array         # advective CFL of the accepted step
    dt: Array              # dt actually used (varies under CFL-adaptive mode)


@dataclasses.dataclass(eq=False)  # identity hash: usable as a jit static
class Simulation:
    """Bundles the static pieces of a problem; exposes pure step functions.

    All members are either Python statics or device arrays captured as jit
    constants, so ``make_step_fn()`` returns a closure that jit/scan/shard
    cleanly.
    """

    grid: GridSpec
    bcs: BCTable
    params: SimParams
    op: PoissonOp
    face_masks: Optional[tuple[Array, ...]]
    corr_masks: Optional[tuple[Array, ...]]
    forcing: Optional[tuple[Array, ...]] = None
    # Domain-decomposition shardings (a State-shaped pytree of NamedSharding).
    # Applied as with_sharding_constraint at step entry/exit: GSPMD then lays
    # out every stencil as halo exchanges over the mesh (supports uneven
    # staggered dims, which device_put/out_shardings reject).
    shardings: Optional[State] = None
    # Direct spectral solver (set when params.poisson.method == "fft").
    dct_solver: Optional[object] = None
    # Geometric multigrid solver (set when params.poisson.method == "mg").
    mg_solver: Optional[object] = None
    # Spectrally-preconditioned CG (set when method == "dctcg"): the exact
    # unmasked DCT inverse preconditions CG on the obstacle-masked operator.
    dctcg_solver: Optional[object] = None
    # Explicit halo-exchange pressure solver (parallel/halo.py): set by
    # parallel.sharded_simulation(..., poisson_comm="halo") for
    # jacobi/gs/sor/cg runs; the Poisson while_loop then runs as ONE
    # shard_map'd program with hand-written ppermute halos + psum
    # reductions instead of GSPMD-inserted collectives.
    halo_solver: Optional[object] = None
    # Run Pallas kernels in interpret mode (CPU testing only).
    pallas_interpret: bool = False
    # Optional transported scalar + Boussinesq coupling (scalar.py).
    scalar: Optional[object] = None
    # Solid-cell mask (bool, cell-centered) for the SCALAR's immersed-body
    # treatment -- set when both a scalar and an obstacle are configured
    # (scalar.body_bc selects isothermal/adiabatic; scalar.py module doc).
    scalar_solid: Optional[Array] = None
    # Optional Smagorinsky LES closure (les.py): adds the subgrid stress
    # divergence to the predictor each stage. 3D runs stream the per-step
    # eddy viscosity into the per-component fused predictor as a fourth
    # operand (_pallas_les_ok; sharded static-Smagorinsky runs too via
    # _pallas_les_sharded_ok -- the nu_t ghost planes ride extra ppermute
    # pairs); the whole-step fused paths stay off by measurement
    # (docs/KERNELS.md "LES through the fused predictor").
    les: Optional[object] = None
    # Optional sharp-interface immersed boundary (ibm.py): direct forcing
    # on the first fluid face ring before each projection. Layers on top
    # of the staircase masks (which stay as the pressure treatment).
    ibm: Optional[object] = None
    # Reverse-mode differentiable pressure solve (adjoint.py): wrap
    # _solve_pressure in an implicit-function-theorem custom VJP so
    # jax.grad flows through the projection without unrolling the
    # iterative solver's while_loop (which is not reverse-differentiable).
    # Set via adjoint.differentiable(sim); forces the jnp step.
    diff_solve: bool = False
    # Kernel-initiated remote-DMA ghost exchange on the sharded fused
    # slab tier (parallel/remote_dma.py): zero jnp-level ppermutes on
    # the steady path. Opt-in via sharded_simulation(rdma=True); only
    # honored where the slab fused tier dispatches (plain/thermal/
    # forced configs -- no convective outlet, no timedep).
    rdma: bool = False

    @staticmethod
    def build(
        grid: GridSpec,
        bcs: BCTable,
        params: SimParams,
        solid: Optional[np.ndarray] = None,
        forcing: Optional[tuple[Array, ...]] = None,
        scalar=None,
        les=None,
        sdf=None,
        surface_velocity=None,
        sharp_pressure: bool = False,
    ) -> "Simulation":
        """``sdf``: optional signed-distance function of the obstacle
        surface (negative inside). When given (and ``solid`` is None) the
        staircase cell mask derives from it AND the velocity boundary
        treatment upgrades to sharp-interface direct forcing (ibm.py).
        ``surface_velocity(*coords) -> nd components``: optional body
        surface velocity for moving boundaries (e.g. a rotating
        cylinder); requires ``sdf``. ``sharp_pressure`` (requires sdf):
        cut-cell apertured Poisson/divergence/correction (cutcell.py) --
        the pressure side of the sharp-interface story; iterative
        solvers only (jacobi/gs/sor/cg/mg/mgcg)."""
        bcs_mod.validate_bcs(grid, bcs)
        ibm_op = None
        cut = None
        if sharp_pressure:
            if sdf is None:
                raise ValueError("sharp_pressure requires an sdf")
            if params.poisson.method in ("fft", "dctcg"):
                raise ValueError(
                    "sharp_pressure needs an iterative/mg Poisson method "
                    f"(the {params.poisson.method!r} spectral machinery "
                    "assumes binary masks)"
                )
            from . import cutcell

            cut = cutcell.cut_geometry(grid, sdf)
            solid = np.asarray(cut[2])
        if sdf is not None:
            from . import ibm as ibm_mod

            if solid is None:
                solid = ibm_mod.solid_from_sdf(grid, sdf)
        scalar_solid = None
        if scalar is not None:
            scalar.validate(grid)
            per = bcs_mod.periodic_axes(grid, bcs)
            if scalar.buoyancy and any(
                b != 0.0 and per[a] for a, b in enumerate(scalar.buoyancy)
            ):
                raise ValueError(
                    "Boussinesq buoyancy along a periodic axis is not "
                    "supported (the wrap predictor expects n-face forcing)"
                )
            if solid is not None and np.asarray(solid).any():
                if scalar.body_bc is None:
                    raise ValueError(
                        "scalar transport with an obstacle needs "
                        "scalar.body_bc (ScalarBC.dirichlet(v) for an "
                        "isothermal body, ScalarBC.adiabatic() for an "
                        "insulated one)"
                    )
                scalar_solid = jnp.asarray(np.asarray(solid), bool)
        dct_solver = None
        if params.poisson.method == "fft":
            from .ops import fft_poisson

            if not fft_poisson.is_applicable(grid, bcs, solid):
                raise ValueError(
                    "poisson method 'fft' needs an obstacle-free domain "
                    "(walls/inflow/outflow/periodic faces all diagonalize, "
                    "but an interior obstacle mask does not); use an "
                    "iterative method or 'dctcg' for this case"
                )
            dct_solver = fft_poisson.DCTPoissonSolver.build(
                grid, kinds=fft_poisson.axis_kinds_from_bcs(grid, bcs)
            )
        dctcg_solver = None
        if params.poisson.method == "dctcg":
            from .ops import fft_poisson

            dctcg_solver = fft_poisson.DCTPCGSolver.build(grid, bcs, solid)
        mg_solver = None
        if params.poisson.method in ("mg", "mgcg"):
            from .ops import multigrid

            mg_solver = multigrid.MGPoissonSolver.build(
                grid, bcs, solid,
                sdf=sdf if sharp_pressure else None,
            )
        per = bcs_mod.periodic_axes(grid, bcs)
        if cut is not None:
            # cut-cell masks: a face is a velocity DOF iff its aperture is
            # open; corrections apply on every open interior face -- the
            # exact consistency triple with divergence_ap + the cut op
            ap_np = cut[0]
            face_masks = tuple(
                jnp.asarray((np.asarray(a) > 0).astype(np.float64),
                            grid.dtype)
                for a in ap_np
            )
            nd = grid.ndim
            corr_masks = tuple(
                jnp.asarray(
                    (np.asarray(ap_np[a])[tuple(
                        slice(1, -1) if d == a else slice(None)
                        for d in range(nd)
                    )] > 0).astype(np.float64),
                    grid.dtype,
                )
                for a in range(nd)
            )
            op = poisson_mod.build_poisson_op_cut(grid, bcs, ap_np, cut[1])
        else:
            face_masks = bcs_mod.face_masks_from_solid(grid, solid, per)
            corr_masks = bcs_mod.correction_face_masks(grid, solid, per)
            op = poisson_mod.build_poisson_op(grid, bcs, solid)
        if sdf is not None and face_masks is not None:
            from . import ibm as ibm_mod

            ibm_op = ibm_mod.build_ibm(grid, bcs, sdf, face_masks,
                                       velocity=surface_velocity)
        return Simulation(
            grid=grid,
            bcs=bcs,
            params=params,
            op=op,
            face_masks=face_masks,
            corr_masks=corr_masks,
            forcing=forcing,
            dct_solver=dct_solver,
            mg_solver=mg_solver,
            dctcg_solver=dctcg_solver,
            scalar=scalar,
            scalar_solid=scalar_solid,
            les=les,
            ibm=ibm_op,
        )

    # -- single step ---------------------------------------------------------

    def initial_state(self) -> State:
        st = zero_state(self.grid)
        # time-dependent BC callables: impose the t=0 values (a callable
        # own-axis inflow value is not face-settable unresolved)
        b = (bcs_mod.resolve_bcs(self.bcs, 0.0)
             if bcs_mod.bcs_time_dependent(self.bcs) else self.bcs)
        u = bcs_mod.apply_velocity_bcs(self.grid, b, st.u, self.face_masks)
        theta = None
        if self.scalar is not None:
            init = getattr(self.scalar, "theta_init", None)
            theta = (jnp.zeros(self.grid.shape, self.grid.dtype)
                     if init is None else jnp.asarray(init, self.grid.dtype))
            if self.scalar_solid is not None:
                from . import scalar as scalar_mod

                theta = scalar_mod.freeze_body(
                    self.scalar, theta, self.scalar_solid
                )
        # extrapolating warm start carries p_prev through the scan (pytree
        # structure must be static, so it is populated from step 0)
        p_prev = st.p if self.params.poisson.extrapolate else None
        t = (jnp.zeros((), self.grid.dtype)
             if self._time_dependent() else None)
        return State(u=u, p=st.p, theta=theta, p_prev=p_prev, t=t)

    def _pallas_ok(self) -> bool:
        """Fused predictor applies to 2D/3D float32 runs w/o forcing.
        Sharded 3D runs keep the Pallas path via shard_map + ppermute halo
        planes (parallel/pallas_sharded.py)."""
        use = self.params.use_pallas
        if use is None:
            # Auto: only the 3D kernel wins end-to-end (6.3 -> ~2 ms of
            # predictor work per step at 256^3). The 2D kernel's compute
            # matches XLA's fusion but its jnp-side pre-padding costs
            # ~0.5 ms/step at 2048^2 (measured: 1.64 -> 2.14 ms/step), so
            # 2D keeps the jnp path unless explicitly requested.
            use = (
                jax.default_backend() == "tpu"
                and self.grid.ndim == 3
                and not self.pallas_interpret
            )
        if not use or self.forcing is not None or self.les is not None:
            return False
        if self.diff_solve:
            return False  # Pallas kernels have no VJP rules (adjoint.py)
        if self.grid.ndim == 2 and any(
            bcs_mod.periodic_axes(self.grid, self.bcs)
        ):
            return False  # 2D kernels have no wrap path (and are auto-off)
        from .ops import pallas_kernels

        if self.shardings is not None:
            # Sharded runs keep the Pallas path via shard_map + ppermute
            # halos (parallel/pallas_sharded.py); 3D over sx/sy meshes.
            if self.grid.ndim != 3:
                return False
            from .parallel.pallas_sharded import (
                predictor_3d_sharded_applicable,
            )

            return predictor_3d_sharded_applicable(
                self.grid, self.bcs, self.shardings.p.mesh
            )
        if self.grid.ndim == 3:
            return pallas_kernels.predictor_3d_applicable(self.grid, self.bcs)
        return pallas_kernels.predictor_2d_applicable(self.grid)

    def _has_outflow(self) -> bool:
        from .bcs import BCKind

        return any(
            self.bcs[(a, s)].kind in (BCKind.OUTFLOW, BCKind.CONVECTIVE)
            for a in range(self.grid.ndim)
            for s in (0, 1)
        )

    def _constrain(self, state: State) -> State:
        if self.shardings is None:
            return state
        sh = self.shardings
        if (
            (state.theta is not None and sh.theta is None)
            or (state.p_prev is not None and sh.p_prev is None)
            or (state.t is not None and sh.t is None)
        ):
            # theta and p_prev are cell-centered: they share p's
            # decomposition; the scalar time is replicated
            from jax.sharding import NamedSharding, PartitionSpec

            sh = State(
                u=sh.u,
                p=sh.p,
                theta=None if state.theta is None else sh.p,
                p_prev=None if state.p_prev is None else sh.p,
                t=(None if state.t is None
                   else NamedSharding(sh.p.mesh, PartitionSpec())),
            )
        return jax.lax.with_sharding_constraint(state, sh)

    def _vel_inv(self, u):
        """max_a max|u_a| / h_a -- the CFL reduction over a velocity field.
        The fused corrector kernels emit exactly this (masked over valid
        entries) for the NEW velocity, so the fused scan can carry it and
        never recompute it."""
        h = self.grid.spacing
        inv = jnp.asarray(1e-12, self.grid.dtype)
        for a, comp in enumerate(u):
            inv = jnp.maximum(inv, jnp.max(jnp.abs(comp)) / h[a])
        return inv

    def _dt_from_vel(self, vel):
        """Per-step dt from a precomputed CFL reduction (see _vel_inv)."""
        pr = self.params
        dt = jnp.asarray(pr.dt, self.grid.dtype)
        if pr.cfl is None:
            return dt
        floor = jnp.asarray(1e-12, self.grid.dtype)
        return jnp.minimum(dt, pr.cfl / jnp.maximum(vel, floor))

    def _step_dt(self, u):
        """Per-step dt: fixed, or CFL-limited from the current velocity."""
        if self.params.cfl is None:
            return jnp.asarray(self.params.dt, self.grid.dtype)
        return self._dt_from_vel(self._vel_inv(u))

    def _fused3d_ok(self) -> bool:
        """Fully fused 3D step (predictor+BC+RHS kernel, corrector+diag
        kernel): unsharded 3D float32, scalar BCs, no forcing/scalar.
        Relies on the state invariant that boundary faces carry BC values
        (initial_state and the corrector kernel maintain it), so the
        per-step entry BC pass disappears too."""
        use = self.params.use_pallas
        if use is None:
            use = (
                jax.default_backend() == "tpu"
                and self.grid.ndim == 3
                and not self.pallas_interpret
            )
        if not use or self.grid.ndim != 3 or self.diff_solve:
            return False
        # time-dependent BC VALUES (traced scalars riding the SMEM hoist
        # -- pallas_kernels._hoist_tables) compose with EVERY whole-step
        # composition this gate admits: plain/masked/forced, euler+rk2,
        # CFL, outflow+convective outlets, IBM (static and moving), cut-
        # cell apertures, and scalar transport (interpret parity in
        # test_timedep.py / test_fused_step.py) -- the wrapper-level
        # compositions are jnp and take tracers; only the in-kernel ghost
        # values needed the hoist. No traced-specific exclusions remain
        # unsharded; the sharded tiers gate traced off (_fused3d_
        # sharded_ok).
        traced = bcs_mod.bcs_values_traced(self.bcs)
        if self.op.ap is not None:
            # cut-cell apertured pressure COMPOSES (round 4): the kernels
            # run the masked step on the cut-derived open/corr codes
            # (binary == apertured outside the cut band), the wrapper
            # patches the Poisson RHS with the boxed apertured-divergence
            # delta and folds the boxed apertured |div| max into the
            # diagnostics (band cells kernel-excluded via the FLUID bit
            # -- see cutcell.py "fused 3D whole-step composition").
            # Scalar transport with apertures stays jnp (the in-kernel
            # theta fluxes would need aperture weighting).
            if self.scalar is not None or self._cut3d_np() is None:
                return False
        if self.params.integrator not in ("euler", "rk2"):
            return False
        # rk2 + obstacles IS fused (round 3): the stage-2 based-mode
        # predictor streams the same code operands as stage 1, gating the
        # assembled star after the BC writes -- per-stage order matches
        # the jnp rk2 branch (interpret-mode parity in test_fused_step).
        # CFL-adaptive dt IS supported: the corrector kernel's masked
        # max|u_a|/h_a diagnostic (garbage rows excluded) is carried through
        # the scan and sets the next step's dt -- zero extra passes.
        # Obstacles are supported too: uint8 face codes stream alongside
        # the velocity windows (see pallas_kernels.build_face_codes_3d).
        # Periodic axes are supported (in-kernel wraps + axis-0 ghost-row
        # refresh) -- but not COMBINED with obstacle masks. STATIC scalar
        # body forcing (channel/duct) is baked into the predictor kernel.
        # Scalar transport + Boussinesq buoyancy fuse too (theta streams
        # with the velocity windows; its flux-form update rides the
        # corrector pass) when the scalar BC values are static scalars.
        # LES stays OFF this path by measurement: streaming the jnp
        # subgrid-stress divergence through per-stage internal<->exact
        # conversions ran 1.76 ms/step at 128^3 Taylor-Green vs 1.60 on
        # the per-component predictor route (_pallas_les_ok), which keeps
        # the in-kernel stress divergence and pays only one nu_t
        # precompute -- see docs/KERNELS.md "LES through the fused
        # predictor". Spatially-varying body forces ARE supported: the
        # static per-face forcing volumes stream alongside the velocity
        # windows (predictor_rhs_3d_internal forcing_fields; converted
        # once, hoisted out of the scan by XLA since they are
        # loop-invariant jit arguments).
        if self.shardings is not None or self.les is not None:
            return False
        if self.ibm is not None:
            # Sharp-interface IBM composes with the fused step: the direct
            # forcing hits u* BETWEEN the two kernels at the internal-
            # layout level and the Poisson RHS is patched with the band
            # delta's divergence (ibm.fused_rhs_patch) -- the band must be
            # strictly interior (fused_ok, build-time check) so the
            # internal-layout rolls never read elided/pad faces. MOVING
            # bodies (wet, round 4 / VERDICT r3 item 5) compose too: wet
            # faces are marked OPEN (never CORR) in the face codes so the
            # kernels preserve the body velocity the entry/mid-step apply
            # imposed, and the in-kernel divergence/CFL diagnostics read
            # the true interface motion -- no post-corrector pass needed.
            if not self.ibm.fused_ok:
                return False
        if self._time_dependent():
            # BC/forcing CALLABLES present: this sim still carries t.
            # _step_timedep resolves them and re-dispatches on a resolved
            # clone, whose traced VALUES are handled below.
            return False
        if bcs_mod.has_convective_outlet(self.grid, self.bcs):
            # rk2 composes (round 4): the stage-2 transport update
            # anchors at the BASE field's carried face in the predictor
            # fixup (the jnp apply_convective_outlets always reads
            # state.u). The theta flux at a convective face remains
            # unfused -- scalar runs keep the jnp step.
            if self.scalar is not None:
                return False
        if self.scalar is not None:
            from .ops import pallas_kernels

            if pallas_kernels.theta_ghost_table(self.scalar, 3) is None:
                return False
            if self.face_masks is not None or self.corr_masks is not None:
                # heated obstacles compose for BOTH body kinds and for
                # buoyant (natural-convection) runs -- round 4, VERDICT
                # r3 item 4. ISOTHERMAL bodies: the wrapper clamps theta
                # in solid cells to the body value around the corrector
                # kernel, so the in-kernel flux update's staircase
                # Dirichlet flux falls out. ADIABATIC bodies: the
                # corrector gates the diffusive flux on the FACE_OPEN
                # bits (body_neumann). Buoyancy streams theta through the
                # masked predictor (the face-averaged force adds before
                # the code gating zeroes closed faces, the jnp order).
                if self.scalar_solid is None or self.ibm is not None:
                    return False
                body = getattr(self.scalar, "body_bc", None)
                if body is None:
                    return False
            # axis-0 HI OUTFLOW composes (round 3): the corrector kernel
            # patches the theta flux at face n0 with the in-register
            # corrected-inner-face copy, so heated spheres in crossflow
            # ride the whole-step path
        if ((self.face_masks is not None or self.corr_masks is not None)
                and any(bcs_mod.periodic_axes(self.grid, self.bcs))):
            return False
        from .ops import pallas_kernels

        return pallas_kernels.fused_step3d_applicable(
            self.grid, self.bcs, allow_traced=traced
        )

    def _fused3d_sharded_ok(self) -> bool:
        """Sharded whole-step fused path (parallel/fused_sharded.py): 1D
        'sx' slab mesh, same gating as _fused3d_ok otherwise (euler + rk2,
        fixed or CFL-adaptive dt). Used from run_scan only (the internal
        layout is carried across the scan)."""
        if self.shardings is None or self.grid.ndim != 3:
            return False
        use = self.params.use_pallas
        if use is None:
            use = (
                jax.default_backend() == "tpu"
                and not self.pallas_interpret
            )
        if not use or self.diff_solve:
            return False
        if bcs_mod.bcs_values_traced(self.bcs):
            # a resolved clone (tracers already in the table) from the
            # per-step _step_timedep route: that route stays jnp GSPMD.
            # Whole BC-timedep SCANS take the fused tiers via
            # _fused3d_sharded_timedep_ok (round 5), which resolves the
            # callables per step inside the scan instead.
            return False
        if self.params.integrator not in ("euler", "rk2"):
            return False
        if self.les is not None:
            return False
        if self.ibm is not None:
            # sharp-interface IBM rides BOTH sharded tiers (round 4):
            # per-shard operand blocks (ghost-slot rows/columns zero),
            # the apply between the kernels with a full ghost refresh on
            # each side (the apply's unit-step rolls then read true
            # neighbor values across shard boundaries in every sharded
            # axis), and the comp-0 shared-ROW / comp-1 shared-COLUMN
            # forcing deltas exchanged for the RHS patch.
            if not self.ibm.fused_ok or self.scalar is not None:
                return False
        masked = self.face_masks is not None or self.corr_masks is not None
        if masked:
            # obstacles stream as STATIC per-shard uint8 code blocks
            # through the halo-mode kernels (no per-step code exchange --
            # fused_sharded.build_face_codes_halo), euler AND rk2 (the
            # based-mode stage-2 predictor streams the same codes).
            # Mirrors _fused3d_ok's masked gates: no cut-cell apertures,
            # no periodic axes. Scalar + obstacle composes (round 4):
            # heated/adiabatic/buoyant bodies ride both sharded tiers
            # (theta codes + clamp/body_neumann as unsharded; buoyancy
            # must be transverse to every sharded axis -- the applicable
            # functions check that).
            if (self.op.ap is not None
                    or any(bcs_mod.periodic_axes(self.grid, self.bcs))):
                return False
            if self.scalar is not None:
                body = getattr(self.scalar, "body_bc", None)
                if (self.scalar_solid is None or body is None
                        or self.ibm is not None):
                    return False
        if self._time_dependent():
            return False
        from .parallel.fused_sharded import (
            fused_step3d_pencil_applicable,
            fused_step3d_sharded_applicable,
        )

        if fused_step3d_sharded_applicable(
            self.grid, self.bcs, self.shardings.p.mesh, self.scalar
        ):
            # spatially-varying forcing fields ride the SLAB tier as
            # static per-shard blocks (fused_sharded.forcing_to_halo)
            return True
        # pencil obstacles AND forcing fields ARE supported
        # (build_face_codes_pencil / forcing_to_pencil: the comp-1
        # shared-face column rides the static blocks)
        # pencil ('sx','sy') tier (VERDICT r2 item 3): euler + rk2, fixed
        # or CFL-adaptive dt, scalar transport + buoyancy
        return fused_step3d_pencil_applicable(
            self.grid, self.bcs, self.shardings.p.mesh, self.scalar
        )

    def _fused3d_sharded_timedep_ok(self) -> bool:
        """Time-dependent BC VALUES through the sharded fused tiers
        (round 5, VERDICT r4 item 3): slab AND pencil. The scan carries
        t; each step resolves the BC callables, streams the resolved
        traced scalars into the shard_map bodies as one replicated
        vector (the kernels hoist them into their SMEM scalar vector
        like the unsharded timedep path), and refreshes the stored
        Dirichlet face planes on the global halo-layout arrays. Callable
        body FORCING composes too: the per-step resolved force packs to
        per-shard blocks inside the scan (forcing_to_halo/_to_pencil)
        and streams through the kernels' forced operand set. Scope: no
        obstacles/IBM/cut-cell, no convective outlet (the held-face
        carry machinery predates per-step values), euler + rk2, fixed or
        CFL-adaptive dt, scalar transport with STATIC scalar BCs
        composes."""
        if self.shardings is None or self.grid.ndim != 3 or self.diff_solve:
            return False
        use = self.params.use_pallas
        if use is None:
            use = (jax.default_backend() == "tpu"
                   and not self.pallas_interpret)
        if not use:
            return False
        if not self._time_dependent():
            return False
        if self.params.integrator not in ("euler", "rk2"):
            return False
        if self.les is not None or self.ibm is not None:
            return False
        if self.face_masks is not None or self.corr_masks is not None:
            return False
        if self.op.ap is not None:
            return False
        if bcs_mod.has_convective_outlet(self.grid, self.bcs):
            return False
        # structural probe at t=0 (concrete values): callable entries
        # must resolve to SCALARS, and the static applicability checks
        # must pass on the resolved table
        probe = bcs_mod.resolve_bcs(self.bcs, 0.0)
        for spec in probe.values():
            for v in spec.velocity:
                if not (np.isscalar(v) or getattr(v, "ndim", 1) == 0):
                    return False
        from .parallel.fused_sharded import (
            fused_step3d_pencil_applicable,
            fused_step3d_sharded_applicable,
        )

        mesh = self.shardings.p.mesh
        if fused_step3d_sharded_applicable(
                self.grid, probe, mesh, self.scalar):
            return True
        return fused_step3d_pencil_applicable(
            self.grid, probe, mesh, self.scalar
        )

    def _fused2d_ok(self) -> bool:
        """Fused 2D whole-step (ops/pallas_2d.py): unsharded 2D float32
        euler runs, obstacles and outflow INCLUDED. Periodic axes and
        static scalar forcing are supported (but not periodic+obstacles).
        Gated to explicit use_pallas=True until the TPU win is measured;
        flip the auto default then."""
        use = self.params.use_pallas
        if not use or self.grid.ndim != 2 or self.diff_solve:
            return False
        if self.op.ap is not None:
            return False  # cut-cell rhs/divergence is jnp-only (apertures)
        if self.params.integrator not in ("euler", "rk2"):
            return False
        if self.shardings is not None or self.les is not None:
            return False
        if self.ibm is not None:
            return False
        if self._time_dependent():
            return False
        if self.forcing is not None and self._static_forcing() is None:
            return False
        if ((self.face_masks is not None or self.corr_masks is not None)
                and any(bcs_mod.periodic_axes(self.grid, self.bcs))):
            return False
        from .ops import pallas_2d

        if bcs_mod.has_convective_outlet(self.grid, self.bcs):
            # kernel composes convective only with the plain euler step:
            # rk2's stage-2 window holds the midpoint field, but the
            # transport update must read the STEP-START face; the theta
            # flux at a convective face is likewise unfused
            if self.params.integrator != "euler" or self.scalar is not None:
                return False
        if self.scalar is not None:
            from .ops import pallas_kernels

            if pallas_kernels.theta_ghost_table(self.scalar, 2) is None:
                return False
            if self.face_masks is not None or self.corr_masks is not None:
                return False
            if self.bcs[(0, 1)].kind is bcs_mod.BCKind.OUTFLOW:
                return False
        return pallas_2d.fused_step2d_applicable(self.grid, self.bcs)

    def _face_codes_2d(self):
        from .ops import pallas_2d

        if not hasattr(self, "_fc2d_cache"):
            codes = pallas_2d.build_face_codes(
                self.grid, self.face_masks, self.corr_masks
            )
            fc = (pallas_2d.pad_fluid_code(self.grid, self.op.code)
                  if codes is not None else None)
            object.__setattr__(self, "_fc2d_cache", (codes, fc))
        return self._fc2d_cache

    def _static_forcing(self):
        """self.forcing as a tuple of Python floats/None, or None when any
        component is a non-scalar (array) force -- the fused-kernel gate."""
        if self.forcing is None:
            return None
        import numpy as _np

        vals = []
        for f in self.forcing:
            if f is None:
                vals.append(None)
            elif isinstance(f, (int, float)) or (
                isinstance(f, _np.ndarray) and f.ndim == 0
            ):
                vals.append(float(f))
            else:
                return None
        return tuple(vals)

    def _tile_db_3d(self):
        """(tile, db) for the fused 3D whole-step kernels (wide planes use
        narrow single-buffered stripes -- pallas_kernels.fused_tile_db)."""
        from .ops import pallas_kernels

        return pallas_kernels.fused_tile_db(self.grid)

    def _fm_for_codes(self):
        """face_masks for the fused-kernel uint8 codes. Moving boundary:
        WET faces (blocked, adjacent to an open face) carry the body
        velocity ub_wet, re-imposed each step by the entry/mid-step ibm
        apply -- mark them OPEN in the codes so the kernels' keep-zeroing
        preserves them and the in-kernel divergence/CFL diagnostics read
        the true interface velocities (the jnp step restores them post-BC
        via apply_wet). They never get a CORR bit: corr_masks are
        fluid&fluid, a wet face touches solid."""
        fm = self.face_masks
        if (self.ibm is not None and self.ibm.wet is not None
                and fm is not None):
            import numpy as _np

            fm = tuple(
                jnp.maximum(
                    f, jnp.asarray(_np.asarray(w) > 0, f.dtype)
                )
                for f, w in zip(fm, self.ibm.wet)
            )
        return fm

    def _cut3d_np(self):
        """Static cut-cell fused-composition constants (band bounding
        box + boxed dalpha/alpha face arrays -- cutcell.fused_cut_consts),
        cached; None when there is no apertured operator or the band is
        not strictly interior (the fused gate then refuses)."""
        if not hasattr(self, "_cut3d_np_cache"):
            out = None
            if self.op.ap is not None and self.grid.ndim == 3:
                from . import cutcell

                wet = self.ibm.wet if self.ibm is not None else None
                out = cutcell.fused_cut_consts(self.grid, self.op.ap, wet)
            object.__setattr__(self, "_cut3d_np_cache", out)
        return self._cut3d_np_cache

    def _cut3d_dev(self):
        """The boxed per-axis alpha arrays as device arrays of the grid
        dtype (threaded through _consts/_bind like every per-cell
        array)."""
        if not hasattr(self, "_cut3d_dev_cache"):
            _, alb, _ = self._cut3d_np()
            dt_ = self.grid.dtype
            out = tuple(jnp.asarray(a, dt_) for a in alb)
            if not any(isinstance(x, jax.core.Tracer) for x in out):
                # only cache concrete arrays: under jit, jnp.asarray
                # lifts the numpy constants into the trace as tracers,
                # and caching those on the static sim leaks them
                object.__setattr__(self, "_cut3d_dev_cache", out)
            return out
        return self._cut3d_dev_cache

    def _face_codes_3d(self):
        from .ops import pallas_kernels

        if not hasattr(self, "_fc3d_cache"):
            tile, _ = self._tile_db_3d()
            codes = pallas_kernels.build_face_codes_3d(
                self.grid, self._fm_for_codes(), self.corr_masks, tile=tile
            )
            code = self.op.code
            if codes is not None and self._cut3d_np() is not None:
                # cut-cell composition: band cells' BINARY divergence is
                # O(u/h) even though the apertured one projects to ~0 --
                # clear their FLUID bit in the KERNEL-ONLY padded code
                # copy so the in-kernel |div| max excludes them; the
                # wrapper folds the boxed apertured max back in
                # (cutcell.fused_div_max_cut). op.code itself (and
                # op.fluid) stay untouched.
                import numpy as _np

                from .ops.poisson import FLUID_BIT

                band = self._cut3d_np()[2]
                carr = _np.asarray(code)
                code = jnp.asarray(_np.where(
                    band, carr & _np.uint8(~(1 << FLUID_BIT) & 0xFF), carr
                ))
            fc = (pallas_kernels.pad_fluid_code_3d(
                      self.grid, code, tile=tile)
                  if codes is not None else None)
            object.__setattr__(self, "_fc3d_cache", (codes, fc))
        return self._fc3d_cache

    def _face_codes_3d_halo(self):
        """Per-shard halo-layout obstacle codes for the sharded fused
        whole-step (fused_sharded.build_face_codes_halo). Built eagerly
        from CONCRETE masks (numpy) and threaded via _consts/_bind --
        on a bound sim the cache is always pre-attached."""
        from .parallel.fused_sharded import (
            build_face_codes_halo,
            pad_fluid_code_halo,
        )

        if not hasattr(self, "_fc3d_halo_cache"):
            mesh = self.shardings.p.mesh
            codes = build_face_codes_halo(
                self.grid, self._fm_for_codes(), self.corr_masks, mesh
            )
            fc = (pad_fluid_code_halo(self.grid, self.op.code, mesh)
                  if codes is not None else None)
            object.__setattr__(self, "_fc3d_halo_cache", (codes, fc))
        return self._fc3d_halo_cache

    def _face_codes_3d_pencil(self):
        """Per-shard pencil-layout obstacle codes for the sharded fused
        whole-step on ('sx','sy') meshes (build_face_codes_pencil);
        cached/threaded like _face_codes_3d_halo."""
        from .parallel.fused_sharded import (
            build_face_codes_pencil,
            pad_fluid_code_pencil,
        )

        if not hasattr(self, "_fc3d_pencil_cache"):
            mesh = self.shardings.p.mesh
            codes = build_face_codes_pencil(
                self.grid, self._fm_for_codes(), self.corr_masks, mesh
            )
            fc = (pad_fluid_code_pencil(self.grid, self.op.code, mesh)
                  if codes is not None else None)
            object.__setattr__(self, "_fc3d_pencil_cache", (codes, fc))
        return self._fc3d_pencil_cache

    def _step_fused2d_internal(
        self, istate: State, vel=None
    ) -> tuple[State, StepDiagnostics, Array]:
        """One fused 2D step over the internal layout (carried across scan
        iterations; ops/pallas_2d.to_internal_2d). ``vel`` is the CFL
        reduction max|u_a|/h_a of the CURRENT velocity (carried from the
        previous corrector's diagnostics, or _vel_inv at scan entry); the
        third return is the new velocity's, closing the carry loop."""
        from .ops import pallas_2d

        g, b, pr = self.grid, self.bcs, self.params
        dt = (self._dt_from_vel(vel) if pr.cfl is not None
              else jnp.asarray(pr.dt, g.dtype))
        codes, fc = self._face_codes_2d()
        thermal = self.scalar is not None and istate.theta is not None
        pred_kw = dict(
            rho=pr.rho,
            face_codes=codes, fluid_code=fc,
            interpret=self.pallas_interpret,
            forcing=self._static_forcing(),
            theta=istate.theta if thermal else None,
            buoyancy=self.scalar.buoyancy if thermal else None,
            theta_ref=self.scalar.theta_ref if thermal else 0.0,
        )
        beta = pr.poisson.extrapolate
        if beta and istate.p_prev is not None:
            p_start = istate.p + beta * (istate.p - istate.p_prev)
        else:
            p_start = istate.p
        it_extra = 0
        if pr.integrator == "rk2":
            with jax.named_scope("predictor_half"):
                ush, rhsh = pallas_2d.predictor_rhs_2d_internal(
                    g, b, istate.u, 0.5 * dt, pr.nu, pr.upwind_gamma,
                    **pred_kw,
                )
            with jax.named_scope("poisson_half"):
                ph_, it_extra, _ = self._solve_pressure(rhsh, p_start)
            with jax.named_scope("correction_half"):
                iu_h, _, _ = pallas_2d.correct_diag_2d_internal(
                    g, b, ush, ph_, 0.5 * dt / pr.rho,
                    face_codes=codes, fluid_code=fc,
                    interpret=self.pallas_interpret,
                )
            with jax.named_scope("predictor"):
                u_star, rhs = pallas_2d.predictor_rhs_2d_internal(
                    g, b, iu_h, dt, pr.nu, pr.upwind_gamma,
                    base=istate.u, **pred_kw,
                )
            p_start = ph_
        else:
            with jax.named_scope("predictor"):
                u_star, rhs = pallas_2d.predictor_rhs_2d_internal(
                    g, b, istate.u, dt, pr.nu, pr.upwind_gamma, **pred_kw,
                )
        with jax.named_scope("poisson"):
            p, iters, res = self._solve_pressure(rhs, p_start)
            iters = iters + it_extra
        with jax.named_scope("correction"):
            corr = pallas_2d.correct_diag_2d_internal(
                g, b, u_star, p, dt / pr.rho,
                face_codes=codes, fluid_code=fc,
                interpret=self.pallas_interpret,
                theta=istate.theta if thermal else None,
                scalar_cfg=self.scalar if thermal else None,
                dt=dt if thermal else None,
            )
            if thermal:
                iu_new, max_div, max_vel, theta_new = corr
            else:
                iu_new, max_div, max_vel = corr
                theta_new = istate.theta
        diag = StepDiagnostics(
            poisson_iters=iters,
            poisson_res=res,
            max_div=max_div,
            max_cfl=max_vel * dt,
            dt=dt,
        )
        p_prev_new = istate.p if istate.p_prev is not None else None
        return (State(u=iu_new, p=p, theta=theta_new, p_prev=p_prev_new),
                diag, max_vel)

    def _step_fused2d(self, state: State) -> tuple[State, StepDiagnostics]:
        from .ops import pallas_2d

        vel = (self._vel_inv(state.u) if self.params.cfl is not None
               else None)
        iu = pallas_2d.to_internal_2d(self.grid, state.u)
        itheta = (pallas_2d.pad_theta_2d(self.grid, state.theta)
                  if state.theta is not None else None)
        istate, diag, _ = self._step_fused2d_internal(
            State(u=iu, p=state.p, theta=itheta, p_prev=state.p_prev), vel
        )
        u0, u1 = pallas_2d.from_internal_2d(self.grid, self.bcs, istate.u)
        n0, n1 = self.grid.shape
        theta = (istate.theta[:n0, :n1]
                 if istate.theta is not None else None)
        return State(u=(u0, u1), p=istate.p, theta=theta,
                     p_prev=istate.p_prev), diag

    def _solve_pressure(self, rhs: Array, p0: Array):
        """Dispatch to the configured pressure solver; returns (p, iters, res)."""
        if self.diff_solve:
            from . import adjoint

            return adjoint.implicit_solve(adjoint.base_of(self), rhs, p0)
        pr = self.params
        if self.halo_solver is not None:
            # op (+ mg level ops / dctcg transform arrays) passed
            # explicitly: their arrays are threaded as traced jit
            # arguments (run_scan consts), not baked program constants.
            return self.halo_solver.solve(
                rhs, p0, op=self.op,
                mg_ops=(self.mg_solver.ops
                        if self.mg_solver is not None else None),
                dctcg_consts=getattr(self, "_dctcg_halo", None),
            )
        if self.dct_solver is not None:
            from .ops import fft_poisson

            return fft_poisson.solve_with_residual(
                self.dct_solver, self.op, rhs,
                diag_residual=pr.poisson.diag_residual,
            )
        if self.dctcg_solver is not None:
            return self.dctcg_solver.solve(
                rhs, p0, pr.poisson.tol, pr.poisson.max_iters, op=self.op
            )
        if self.mg_solver is not None:
            mg_solve = (
                self.mg_solver.solve_pcg
                if pr.poisson.method == "mgcg"
                else self.mg_solver.solve
            )
            return mg_solve(rhs, p0, pr.poisson.tol, pr.poisson.max_iters)
        return poisson_mod.solve_poisson(
            self.op, rhs, p0, self.grid, pr.poisson
        )

    def _step_fused3d_internal(
        self, istate: State, vel=None
    ) -> tuple[State, StepDiagnostics, Array]:
        """One fused step over the INTERNAL padded layout (carried across
        scan iterations so the per-step pad/slice/concat glue disappears;
        see ops/pallas_kernels.to_internal_3d). ``vel``/third return: the
        carried CFL reduction, as in _step_fused2d_internal."""
        from .ops import pallas_kernels

        g, b, pr = self.grid, self.bcs, self.params
        dt = (self._dt_from_vel(vel) if pr.cfl is not None
              else jnp.asarray(pr.dt, g.dtype))
        codes, fcode = self._face_codes_3d()
        tile, db = self._tile_db_3d()
        ibm_i = None
        if self.ibm is not None:
            from . import ibm as ibm_mod

            # internal-layout clone of the direct-forcing operator (pads
            # of loop-invariant args; XLA hoists them out of the scan).
            # Entry apply mirrors the jnp step's bcs+ibm entry pass: the
            # previous correction perturbed the band faces.
            ibm_i = ibm_mod.internal_forcing(g, self.ibm, tile=tile)
            istate = dataclasses.replace(istate, u=ibm_i.apply(istate.u))
        thermal = self.scalar is not None and istate.theta is not None
        pred_kw = dict(
            rho=pr.rho,
            tile=tile, db=db,
            interpret=self.pallas_interpret,
            face_codes=codes, fluid_code=fcode,
            forcing=self._static_forcing(),
            theta=istate.theta if thermal else None,
            buoyancy=self.scalar.buoyancy if thermal else None,
            theta_ref=self.scalar.theta_ref if thermal else 0.0,
        )
        if self.forcing is not None and pred_kw["forcing"] is None:
            # spatially-varying body force: stream the per-face volumes
            # through the predictor kernel (internal layout; the convert
            # is loop-invariant so XLA hoists it out of the scan)
            pred_kw["forcing_fields"] = self._forcing_fields_internal()
        beta = pr.poisson.extrapolate
        if beta and istate.p_prev is not None:
            p_start = istate.p + beta * (istate.p - istate.p_prev)
        else:
            p_start = istate.p
        it_extra = 0
        if pr.integrator == "rk2":
            # midpoint rule, both stages fused: stage 1 advances half a
            # step and projects; stage 2 streams the stage-1 field as the
            # stencil source while anchoring u* at the step-start state
            # (u* = u_n + dt*RHS(u_half)), matching the jnp rk2 branch.
            with jax.named_scope("predictor_half"):
                ush, rhsh = pallas_kernels.predictor_rhs_3d_internal(
                    g, b, istate.u, 0.5 * dt, pr.nu, pr.upwind_gamma,
                    **pred_kw,
                )
            if ibm_i is not None:
                # every projection STAGE sees the interpolated wall values
                # (the jnp rk2 path calls _project -> ibm.apply per stage)
                with jax.named_scope("ibm_half"):
                    ush_f = ibm_i.apply(ush)
                    rhsh = ibm_mod.fused_rhs_patch(
                        g, rhsh, ush, ush_f, pr.rho / (0.5 * dt),
                        self.op.fluid,
                    )
                    ush = ush_f
            if self.op.ap is not None:
                from . import cutcell

                with jax.named_scope("cut_rhs_half"):
                    rhsh = cutcell.fused_rhs_patch_cut(
                        g, rhsh, ush, self._cut3d_dev(),
                        self._cut3d_np()[0], pr.rho / (0.5 * dt),
                    )
            with jax.named_scope("poisson_half"):
                ph_, it_extra, _ = self._solve_pressure(rhsh, p_start)
            with jax.named_scope("correction_half"):
                iu_h, _, _ = pallas_kernels.correct_diag_3d_internal(
                    g, b, ush, ph_, 0.5 * dt / pr.rho,
                    tile=tile, db=db,
                    interpret=self.pallas_interpret,
                    face_codes=codes, fluid_code=fcode,
                )
            with jax.named_scope("predictor"):
                u_star, rhs = pallas_kernels.predictor_rhs_3d_internal(
                    g, b, iu_h, dt, pr.nu, pr.upwind_gamma,
                    base=istate.u, **pred_kw,
                )
            p_start = ph_
        else:
            with jax.named_scope("predictor"):
                u_star, rhs = pallas_kernels.predictor_rhs_3d_internal(
                    g, b, istate.u, dt, pr.nu, pr.upwind_gamma, **pred_kw,
                )
        if ibm_i is not None:
            # sharp-interface direct forcing on u* between the kernels,
            # with the RHS divergence patched for the band delta (the
            # fused predictor computed it from the unforced u*)
            with jax.named_scope("ibm"):
                u_forced = ibm_i.apply(u_star)
                rhs = ibm_mod.fused_rhs_patch(
                    g, rhs, u_star, u_forced, pr.rho / dt, self.op.fluid
                )
                u_star = u_forced
        if self.op.ap is not None:
            # cut-cell: upgrade the kernel's binary-masked divergence to
            # the apertured one on the band box (identical outside it)
            from . import cutcell

            with jax.named_scope("cut_rhs"):
                rhs = cutcell.fused_rhs_patch_cut(
                    g, rhs, u_star, self._cut3d_dev(),
                    self._cut3d_np()[0], pr.rho / dt,
                )
        with jax.named_scope("poisson"):
            p, iters, res = self._solve_pressure(rhs, p_start)
            iters = iters + it_extra
        with jax.named_scope("correction"):
            body_neumann = False
            if thermal and self.scalar_solid is not None:
                from .scalar import ScalarBCKind

                body_neumann = (self.scalar.body_bc.kind
                                is ScalarBCKind.NEUMANN)
            corr = pallas_kernels.correct_diag_3d_internal(
                g, b, u_star, p, dt / pr.rho,
                tile=tile, db=db,
                interpret=self.pallas_interpret,
                face_codes=codes, fluid_code=fcode,
                theta=istate.theta if thermal else None,
                scalar_cfg=self.scalar if thermal else None,
                dt=dt if thermal else None,
                body_neumann=body_neumann,
            )
            if thermal:
                iu_new, max_div, max_vel, theta_new = corr
                if self.scalar_solid is not None and not body_neumann:
                    # isothermal body: re-clamp solid cells to the body
                    # value (the kernel's flux update wrote garbage
                    # there; the clamp maintains the invariant the next
                    # step's diffusive interface flux relies on).
                    # Adiabatic bodies skip the clamp -- their solid
                    # cells diffuse freely behind closed interface
                    # fluxes, exactly as in scalar.scalar_rhs.
                    solid_i = pallas_kernels.pad_theta_3d(
                        g, self.scalar_solid, tile
                    )
                    theta_new = jnp.where(
                        solid_i,
                        jnp.asarray(self.scalar.body_bc.value,
                                    theta_new.dtype),
                        theta_new,
                    )
            else:
                iu_new, max_div, max_vel = corr
                theta_new = istate.theta
        if self.op.ap is not None:
            # fold the boxed apertured |div| max over the band back into
            # the diagnostic (the kernel's max excluded band cells via
            # the cleared FLUID bit -- _face_codes_3d)
            from . import cutcell

            with jax.named_scope("cut_div"):
                max_div = jnp.maximum(max_div, cutcell.fused_div_max_cut(
                    g, iu_new, self._cut3d_dev(), self._cut3d_np()[0]
                ))
        diag = StepDiagnostics(
            poisson_iters=iters,
            poisson_res=res,
            max_div=max_div,
            max_cfl=max_vel * dt,
            dt=dt,
        )
        p_prev_new = istate.p if istate.p_prev is not None else None
        return (State(u=iu_new, p=p, theta=theta_new, p_prev=p_prev_new),
                diag, max_vel)

    def _forcing_fields_exact(self):
        """Spatially-varying self.forcing broadcast to the jnp
        predictor's per-face volume shapes (interior faces along the own
        axis; all n distinct faces on a periodic own axis), None
        components becoming zeros."""
        g, b = self.grid, self.bcs
        per = bcs_mod.periodic_axes(g, b)
        fields = []
        for a in range(3):
            shp = list(g.shape)
            if not per[a]:
                shp[a] -= 1
            f = self.forcing[a]
            if f is None:
                fields.append(jnp.zeros(tuple(shp), g.dtype))
            else:
                fields.append(jnp.broadcast_to(
                    jnp.asarray(f, g.dtype), tuple(shp)
                ))
        return tuple(fields)

    def _forcing_fields_internal(self):
        """Spatially-varying self.forcing as internal-layout per-face
        volumes for the fused 3D predictor kernel."""
        from .ops import pallas_kernels

        return pallas_kernels.forcing_to_internal_3d(
            self.grid, self.bcs, self._forcing_fields_exact(),
            tile=self._tile_db_3d()[0]
        )

    def _step_fused3d(self, state: State) -> tuple[State, StepDiagnostics]:
        """Whole-step fused path on exact-layout state: convert to the
        internal layout, run one internal step, convert back."""
        from .ops import pallas_kernels

        tile, _ = self._tile_db_3d()
        if bcs_mod.bcs_values_traced(self.bcs):
            # time-dependent BC VALUES: the carried boundary faces hold
            # the PREVIOUS step's values (the corrector preserved what
            # last step's predictor wrote). The jnp step re-applies BCs at
            # entry, so mirror it here -- tangential GHOSTS need nothing
            # (synthesized in-kernel from the current hoisted tables);
            # only the stored own-axis faces are refreshed. Static-BC
            # runs skip this (the invariant makes it a no-op). Runs
            # BEFORE the CFL reduction, like the jnp step's entry pass.
            u = bcs_mod.apply_velocity_bcs(self.grid, self.bcs, state.u,
                                           self.face_masks)
            state = dataclasses.replace(state, u=u)
        vel = (self._vel_inv(state.u) if self.params.cfl is not None
               else None)
        iu = pallas_kernels.to_internal_3d(self.grid, state.u, tile)
        itheta = (pallas_kernels.pad_theta_3d(self.grid, state.theta, tile)
                  if state.theta is not None else None)
        istate, diag, _ = self._step_fused3d_internal(
            State(u=iu, p=state.p, theta=itheta, p_prev=state.p_prev), vel
        )
        u0, u1, u2e, face = pallas_kernels.from_internal_3d(
            self.grid, self.bcs, istate.u
        )
        u2 = jnp.concatenate([u2e, face], axis=2)
        n0, n1, n2 = self.grid.shape
        theta = (istate.theta[:n0, :n1, :n2]
                 if istate.theta is not None else None)
        return State(u=(u0, u1, u2), p=istate.p, theta=theta,
                     p_prev=istate.p_prev), diag

    def _combined_forcing(self, theta):
        """Static body forcing + Boussinesq buoyancy from the scalar."""
        if self.scalar is None or theta is None:
            return self.forcing
        from . import scalar as scalar_mod

        buoy = scalar_mod.buoyancy_forcing(self.grid, self.scalar, theta)
        if buoy is None:
            return self.forcing
        if self.forcing is None:
            return buoy
        return tuple(
            b if f is None else (f if b is None else f + b)
            for f, b in zip(self.forcing, buoy)
        )

    def _pallas_les_ok(self) -> bool:
        """LES-through-the-kernel gate: the per-component 3D predictor
        streams the precomputed cell-centered nu_t as a fourth canonical
        operand (ops/pallas_kernels._predictor3d_kernel les=True). Unsharded
        3D only; _pallas_ok itself refuses LES, so this is a separate
        check."""
        use = self.params.use_pallas
        if use is None:
            use = (
                jax.default_backend() == "tpu"
                and self.grid.ndim == 3
                and not self.pallas_interpret
            )
        if (not use or self.grid.ndim != 3 or self.shardings is not None
                or self.diff_solve):
            return False
        from .ops import pallas_kernels

        return pallas_kernels.predictor_3d_applicable(self.grid, self.bcs)

    def _pallas_les_sharded_ok(self) -> bool:
        """SHARDED LES-through-the-kernel gate: the sharded fused
        predictor (parallel/pallas_sharded.py) streams the per-shard
        eddy viscosity as a fourth canonical operand, with the nu_t ghost
        planes riding one extra ppermute pair per sharded axis. Static
        Smagorinsky only (the dynamic model's test filter + global
        least-squares reductions stay on the jnp path)."""
        if self.shardings is None or self.grid.ndim != 3:
            return False
        if self.les is None or self.les.model != "smagorinsky":
            return False
        use = self.params.use_pallas
        if use is None:
            use = (
                jax.default_backend() == "tpu"
                and not self.pallas_interpret
            )
        if not use or self.diff_solve:
            return False
        from .parallel.pallas_sharded import predictor_3d_sharded_applicable

        return predictor_3d_sharded_applicable(
            self.grid, self.bcs, self.shardings.p.mesh
        )

    def _predict(self, u, dt, forcing=None):
        """``u* = u + dt * RHS_adv_diff(u) [+ forcing]``, BC-applied."""
        g, b, pr = self.grid, self.bcs, self.params
        if self.les is not None:
            # Smagorinsky subgrid stress of the CURRENT stage field
            # (recomputed per rk2 stage). 3D unsharded runs keep the fused
            # predictor: nu_t streams into the kernel and the stress
            # divergence is computed in-register; everything else merges
            # the jnp stress into `forcing` (jnp predictor path).
            from . import les as les_mod

            if forcing is None and self._pallas_les_ok():
                from .ops import pallas_kernels

                canon = pallas_kernels.build_canon_3d(g, b, u)
                if self.les.model == "smagorinsky":
                    # static coefficient: nu_t comes from its own Pallas
                    # kernel over the SAME canonical windows (one strain
                    # pass in-register instead of ~10 jnp stencil fields)
                    cfg = self.les
                    nu_t = pallas_kernels.nu_t_3d_from_canon(
                        g, b, canon,
                        cfg.cs * cfg.cs * cfg.filter_width(g) ** 2,
                        interpret=self.pallas_interpret,
                    )
                else:
                    # dynamic (Germano) coefficient: the test filter needs
                    # wider support; keep the jnp nu_t
                    nu_t = les_mod.eddy_viscosity(g, b, u, self.les)
                u_star = pallas_kernels.predictor_3d_from_canon(
                    g, b, canon, dt, pr.nu, pr.upwind_gamma,
                    interpret=self.pallas_interpret,
                    nt_canon=pallas_kernels.nt_canon_3d(g, b, nu_t),
                )
                return bcs_mod.apply_velocity_bcs(
                    g, b, u_star, self.face_masks
                )
            if forcing is None and self._pallas_les_sharded_ok():
                from .parallel.pallas_sharded import predictor_3d_sharded

                cfg = self.les
                u_star = predictor_3d_sharded(
                    g, b, self.shardings.p.mesh, u, dt, pr.nu,
                    pr.upwind_gamma, interpret=self.pallas_interpret,
                    les_scale=cfg.cs * cfg.cs * cfg.filter_width(g) ** 2,
                )
                return bcs_mod.apply_velocity_bcs(
                    g, b, u_star, self.face_masks
                )
            sgs = les_mod.sgs_forcing(g, b, u, self.les)
            forcing = (sgs if forcing is None else tuple(
                s if f is None else f + s for f, s in zip(forcing, sgs)
            ))
        if forcing is None and self._pallas_ok():
            from .ops import pallas_kernels

            if self.shardings is not None:
                from .parallel.pallas_sharded import predictor_3d_sharded

                u_star = predictor_3d_sharded(
                    g, b, self.shardings.p.mesh, u, dt, pr.nu,
                    pr.upwind_gamma, interpret=self.pallas_interpret,
                )
            else:
                pred = (pallas_kernels.predictor_3d if g.ndim == 3
                        else pallas_kernels.predictor_2d)
                u_star = pred(
                    g, b, u, dt, pr.nu, pr.upwind_gamma,
                    interpret=self.pallas_interpret,
                )
        else:
            u_star = stencils.predictor(
                g, b, u, dt, pr.nu, pr.upwind_gamma, forcing
            )
        return bcs_mod.apply_velocity_bcs(g, b, u_star, self.face_masks)

    def _div(self, u):
        """Divergence consistent with the Poisson operator: apertured
        (cut-cell) fluxes when the op carries face apertures, the plain
        staggered divergence otherwise."""
        if self.op.ap is not None:
            return stencils.divergence_ap(self.grid, u, self.op.ap)
        return stencils.divergence(self.grid, u)

    def _project(self, u_star, p0, dt):
        """Pressure-project ``u*`` to divergence-free: solve the Poisson
        equation and apply the correction. Returns (u_new, p, iters, res)."""
        g, b, pr = self.grid, self.bcs, self.params
        if self.ibm is not None:
            # sharp-interface direct forcing on the first fluid ring
            # (every projection stage sees the interpolated wall values)
            with jax.named_scope("ibm"):
                u_star = self.ibm.apply(u_star)
        with jax.named_scope("poisson"):
            rhs = self._div(u_star) * (pr.rho / dt) * self.op.fluid
            p, iters, res = self._solve_pressure(rhs, p0)
        with jax.named_scope("correction"):
            u_new = stencils.correct_velocity(
                g, u_star, p, dt / pr.rho, self.corr_masks,
                bcs_mod.periodic_axes(g, b),
            )
            if bcs_mod.has_convective_outlet(g, b):
                # convective faces get the Dirichlet-ghost pressure
                # correction the Poisson row assumed for them
                u_new = bcs_mod.correct_convective_faces(
                    g, b, u_new, p, dt / pr.rho
                )
            # The correction only writes interior faces (and mirrors the
            # periodic wrap face itself), so u_new's boundary DOFs still
            # carry u*'s BC values -- re-application is only needed for
            # OUTFLOW faces, whose zero-gradient copy must track the updated
            # interior neighbor.
            if self._has_outflow():
                u_new = bcs_mod.apply_velocity_bcs(
                    g, b, u_new, self.face_masks
                )
                if self.ibm is not None:
                    # the face-mask zeroing above just erased the moving
                    # body's wet-face velocities; restore them so the
                    # post-step state (and its divergence diagnostic at
                    # interface cells) stays consistent
                    u_new = self.ibm.apply_wet(u_new)
        return u_new, p, iters, res

    def _time_dependent(self) -> bool:
        """Any BC velocity entry or forcing component a callable of time."""
        if bcs_mod.bcs_time_dependent(self.bcs):
            return True
        return self.forcing is not None and any(
            callable(f) for f in self.forcing
        )

    def _step_timedep(self, state: State) -> tuple[State, StepDiagnostics]:
        """One step of a time-dependent run: resolve the BC/forcing
        callables against the carried ``state.t``, delegate to the static
        step on a resolved copy of the Simulation, advance t by the dt
        actually used (CFL-adaptive runs included). BC KINDS must not
        change in time (the Poisson operator/masks were built from them);
        only the values may. BC values resolve to traced scalars; the
        unsharded fused 3D whole-step STREAMS them (round 4): the ghost-
        table hoist rides them through the kernels' SMEM scalar vector
        and an entry BC pass refreshes the carried own-axis Dirichlet
        faces, so oscillating-lid / pulsatile-inflow runs keep the fused
        kernels -- including the IBM / cut-cell / thermal compositions.
        Sharded BC-timedep SCANS keep the fused tiers too (round 5,
        _fused3d_sharded_timedep_ok); per-STEP sharded calls through
        this route stay jnp GSPMD. Runs whose ONLY time
        dependence is the FORCING keep the fused path on every tier the
        static config would: the resolved force becomes traced per-face
        forcing FIELDS, which stream through the predictor kernel as
        ordinary operands (forcing_fields)."""
        t = state.t
        b, forcing = self._resolve_timedep(t)
        params = self.params
        if bcs_mod.bcs_time_dependent(self.bcs):
            # BC VALUES resolve to traced scalars. The unsharded fused 3D
            # whole-step streams them through the kernels' SMEM scalar
            # vector (round 4: pallas_kernels._hoist_tables) -- probe the
            # resolved clone's own gate; every OTHER Pallas tier bakes
            # values as compile-time floats and is forced off.
            probe = self._timedep_resolved(b, forcing)
            if not probe._fused3d_ok():
                params = dataclasses.replace(params, use_pallas=False)
        sim = self._timedep_resolved(b, forcing, params)
        inner = dataclasses.replace(state, t=None)
        new_state, diag = sim.step(inner)
        return dataclasses.replace(new_state, t=t + diag.dt), diag

    def _resolve_timedep(self, t):
        """(bcs, forcing) with the time callables evaluated at ``t``."""
        b = bcs_mod.resolve_bcs(self.bcs, t)
        forcing = self.forcing
        if forcing is not None and any(callable(f) for f in forcing):
            forcing = tuple(f(t) if callable(f) else f for f in forcing)
        return b, forcing

    def _timedep_resolved(self, b, forcing, params=None) -> "Simulation":
        """Resolved clone carrying the eagerly-built static caches.
        dataclasses.replace drops object.__setattr__ caches; under _bind
        the masks/ops/apertures are TRACED args, so resolved clones must
        inherit the caches (face codes, cut-cell band constants) rather
        than rebuild them from tracers."""
        sim = dataclasses.replace(
            self, bcs=b, forcing=forcing, params=params or self.params,
        )
        for attr in ("_fc3d_cache", "_fc2d_cache", "_cut3d_np_cache",
                     "_cut3d_dev_cache"):
            if hasattr(self, attr):
                object.__setattr__(sim, attr, getattr(self, attr))
        return sim

    def step(self, state: State) -> tuple[State, StepDiagnostics]:
        if state.t is not None:
            return self._step_timedep(state)
        if self._fused3d_ok():
            return self._step_fused3d(state)
        if self._fused2d_ok():
            return self._step_fused2d(state)
        if self.diff_solve:
            # Differentiable runs whose BASE configuration takes a fused
            # whole-step path use the step-level custom VJP: the fused
            # kernels run FORWARD (primal + fwd), and the backward pass
            # differentiates the equivalent jnp step (same math to kernel
            # tolerance; interpret-parity tested) with the IFT pressure
            # solve inside. Lifts the adjoint's fused-kernel exclusion
            # (VERDICT r3 missing #5) for unsharded 2D/3D runs.
            from . import adjoint

            base = adjoint.base_of(self)
            if base._fused3d_ok() or base._fused2d_ok():
                return adjoint.fused_step(self, state)
        return self._step_jnp(state)

    def _step_jnp(self, state: State) -> tuple[State, StepDiagnostics]:
        """The plain jnp/GSPMD projection step (no Pallas kernels). The
        reverse-mode reference implementation: adjoint.fused_step's
        backward pass differentiates THIS function."""
        g, b, pr = self.grid, self.bcs, self.params
        state = self._constrain(state)
        with jax.named_scope("bcs"):
            u = bcs_mod.apply_velocity_bcs(g, b, state.u, self.face_masks)
            if self.ibm is not None:
                # re-impose the interpolated surface values the correction
                # perturbed (and the wet-solid body velocity for moving
                # boundaries, which the face-mask zeroing just erased)
                u = self.ibm.apply(u)
        dt = self._step_dt(u)
        forcing = self._combined_forcing(state.theta)
        # Warm start for the iterative pressure solve: linear extrapolation
        # 2 p_n - p_{n-1} when enabled (PoissonConfig.extrapolate), else the
        # previous pressure.
        beta = pr.poisson.extrapolate
        if beta and state.p_prev is not None:
            p_start = state.p + beta * (state.p - state.p_prev)
        else:
            p_start = state.p
        p_prev_new = state.p if state.p_prev is not None else None
        if pr.integrator == "rk2":
            # Midpoint rule with a projection per stage: advance half a step,
            # project, then advance the FULL step using the midpoint field's
            # advection-diffusion RHS (u* = u + dt*RHS(u_half)); second-order
            # in time where Euler is first-order (SURVEY.md SS0.3 integrator
            # TODO: the reference's order is unknown, both are offered).
            with jax.named_scope("predictor"):
                uh_star = self._predict(u, 0.5 * dt, forcing)
            if bcs_mod.has_convective_outlet(g, b):
                uh_star = bcs_mod.apply_convective_outlets(
                    g, b, uh_star, state.u, 0.5 * dt
                )
            uh, ph, it1, _ = self._project(uh_star, p_start, 0.5 * dt)
            with jax.named_scope("predictor2"):
                adv = self._predict(uh, dt, forcing)
                u_star = tuple(a + (b2 - b1) for a, b2, b1 in zip(u, adv, uh))
                u_star = bcs_mod.apply_velocity_bcs(
                    g, b, u_star, self.face_masks
                )
            if bcs_mod.has_convective_outlet(g, b):
                u_star = bcs_mod.apply_convective_outlets(
                    g, b, u_star, state.u, dt
                )
            u_new, p, iters, res = self._project(u_star, ph, dt)
            iters = iters + it1
        elif pr.integrator == "euler":
            with jax.named_scope("predictor"):
                u_star = self._predict(u, dt, forcing)
            if bcs_mod.has_convective_outlet(g, b):
                u_star = bcs_mod.apply_convective_outlets(
                    g, b, u_star, state.u, dt
                )
            u_new, p, iters, res = self._project(u_star, p_start, dt)
        else:
            raise ValueError(f"unknown integrator {pr.integrator!r}")
        theta_new = state.theta
        if self.scalar is not None and state.theta is not None:
            # Advance the scalar with the end-of-step (divergence-free)
            # velocity; explicit Euler sub-step (first-order splitting of
            # the buoyancy coupling -- the momentum temporal order is
            # unchanged for passive scalars).
            from . import scalar as scalar_mod

            with jax.named_scope("scalar"):
                theta_new = state.theta + dt * scalar_mod.scalar_rhs(
                    g, self.scalar, u_new, state.theta,
                    solid=self.scalar_solid,
                )
                if self.scalar_solid is not None:
                    # solid cells are frozen: clamped to the body value
                    # (isothermal) or held at their previous value
                    # (adiabatic -- no flux crosses the interface, so
                    # their evolution is meaningless garbage)
                    theta_new = jnp.where(
                        self.scalar_solid,
                        scalar_mod.freeze_body(
                            self.scalar, state.theta, self.scalar_solid
                        ),
                        theta_new,
                    )
        new_state = self._constrain(
            State(u=u_new, p=p, theta=theta_new, p_prev=p_prev_new)
        )
        with jax.named_scope("diagnostics"):
            div = self._div(new_state.u) * self.op.fluid
            diag = StepDiagnostics(
                poisson_iters=iters,
                poisson_res=res,
                max_div=jnp.max(jnp.abs(div)),
                max_cfl=stencils.max_cfl(g, new_state.u, dt),
                dt=dt,
            )
        return new_state, diag

    def make_step_fn(self):
        def step_fn(state: State, _=None):
            return self.step(state)

        return step_fn

    # -- scan runner ---------------------------------------------------------

    # -- large-array threading -----------------------------------------------
    # Simulation's per-cell arrays (Poisson diag/code, the spectral
    # inverse-eigenvalue tensor, multigrid levels, masks, forcing) would
    # otherwise be baked into the jitted program as CONSTANTS -- ~150 MB of
    # program at 256^3 and >1 GB at 512^3, which breaks the remote-compile
    # transport and bloats every executable. run_scan threads them through
    # as traced arguments instead.

    def _consts(self):
        # Gate checks run on the non-differentiable base when diff_solve:
        # the diff gates all refuse fused paths, but adjoint.fused_step
        # runs the BASE's fused step forward, and that needs the face
        # codes threaded as traced args like every other per-cell array.
        gate = self
        if self.diff_solve:
            from . import adjoint

            gate = adjoint.base_of(self)
        c = {
            "op": self.op,
            "face_masks": self.face_masks,
            "corr_masks": self.corr_masks,
            "forcing": self.forcing,
            "scalar_solid": self.scalar_solid,
        }
        if self.forcing is not None and any(
            callable(f) for f in self.forcing
        ):
            # time-dependent forcing callables cannot ride a jit pytree;
            # they stay static on the sim (_bind keeps self.forcing), and
            # any concrete arrays mixed into the tuple become program
            # constants for that run
            c["forcing"] = None
        if gate._fused2d_ok():
            # build the uint8 face codes EAGERLY (from concrete masks) and
            # thread them as traced args like every other per-cell array
            c["fc2d"] = self._face_codes_2d()
        fused3d = gate._fused3d_ok()
        if not fused3d and bcs_mod.bcs_time_dependent(self.bcs):
            # BC-value time dependence: if the t=0-resolved clone takes
            # the fused whole-step (concrete values here, so the probe is
            # cache-safe and equals the step-time decision), thread the
            # face codes eagerly -- the per-step resolved sim inherits
            # them via _step_timedep's cache carry instead of rebuilding
            # from the traced masks.
            probe = dataclasses.replace(
                gate, bcs=bcs_mod.resolve_bcs(self.bcs, 0.0)
            )
            fused3d = probe._fused3d_ok()
        if fused3d:
            c["fc3d"] = self._face_codes_3d()
            if self._cut3d_np() is not None:
                c["cut3d"] = self._cut3d_dev()
        if gate._fused3d_sharded_ok() and (
                self.face_masks is not None or self.corr_masks is not None):
            if tuple(self.shardings.p.mesh.axis_names) == ("sx", "sy"):
                c["fc3d_pencil"] = self._face_codes_3d_pencil()
            else:
                c["fc3d_halo"] = self._face_codes_3d_halo()
        if self.dct_solver is not None:
            c["inv_eig"] = self.dct_solver.inv_eig
        if self.dctcg_solver is not None:
            d = self.dctcg_solver
            c["dctcg_inv_eig"] = d.dct.inv_eig
            c["dctcg_cap"] = (
                d.cap_wbox, d.cap_cinv, d.cap_vx, d.cap_vy,
                d.cap_fx, d.cap_fy, d.cap_va, d.cap_vb,
            )
        if (self.halo_solver is not None
                and getattr(self.halo_solver, "dctcg_consts", None)
                is not None):
            # explicit-halo dctcg: the dense per-axis transform matrices
            # + natural-layout spectral multiplier ride as traced args too
            c["dctcg_halo"] = self.halo_solver.dctcg_consts
        if self.mg_solver is not None:
            c["mg_ops"] = self.mg_solver.ops
        if self.ibm is not None:
            c["ibm"] = (self.ibm.masks, self.ibm.w, self.ibm.band,
                        self.ibm.ub, self.ibm.wet, self.ibm.ub_wet)
        return c

    def _solver_consts(self):
        """The per-cell arrays the PRESSURE-SOLVE dispatch reads, as a
        pytree -- the subset of ``_consts()`` that adjoint.py must hoist
        across its custom-VJP boundary explicitly (closure_convert would
        bake integer-dtype tracers like the uint8 stencil code, leaking
        them into the lowered program). Shaped so ``_bind`` accepts it."""
        c = {
            "op": self.op,
            "face_masks": self.face_masks,
            "corr_masks": self.corr_masks,
            # never read by _solve_pressure; None makes _bind keep self's
            "forcing": None,
        }
        if self.dct_solver is not None:
            c["inv_eig"] = self.dct_solver.inv_eig
        if self.dctcg_solver is not None:
            d = self.dctcg_solver
            c["dctcg_inv_eig"] = d.dct.inv_eig
            c["dctcg_cap"] = (
                d.cap_wbox, d.cap_cinv, d.cap_vx, d.cap_vy,
                d.cap_fx, d.cap_fy, d.cap_va, d.cap_vb,
            )
        if (self.halo_solver is not None
                and getattr(self.halo_solver, "dctcg_consts", None)
                is not None):
            # explicit-halo dctcg: the dense per-axis transform matrices
            # + natural-layout spectral multiplier ride as traced args too
            c["dctcg_halo"] = self.halo_solver.dctcg_consts
        if self.mg_solver is not None:
            c["mg_ops"] = self.mg_solver.ops
        if self.ibm is not None:
            # not read by the solve either, but _bind unpacks it when set
            c["ibm"] = (self.ibm.masks, self.ibm.w, self.ibm.band,
                        self.ibm.ub, self.ibm.wet, self.ibm.ub_wet)
        return c

    def _bind(self, c) -> "Simulation":
        """A copy of this Simulation whose big arrays are the (traced)
        pytree ``c`` -- used inside jit so they arrive as arguments."""
        dct = self.dct_solver
        if dct is not None:
            dct = dataclasses.replace(dct, inv_eig=c["inv_eig"])
            if hasattr(self.dct_solver, "_f3d_cache"):
                # the fused trailing-axes route's dense matrices are
                # small eager constants; replace() drops instance attrs
                object.__setattr__(
                    dct, "_f3d_cache", self.dct_solver._f3d_cache
                )
        dctcg = self.dctcg_solver
        if dctcg is not None:
            wbox, cinv, vx, vy, fx, fy, va, vb = c["dctcg_cap"]
            inner = dataclasses.replace(
                dctcg.dct, inv_eig=c["dctcg_inv_eig"]
            )
            if hasattr(dctcg.dct, "_f3d_cache"):
                object.__setattr__(
                    inner, "_f3d_cache", dctcg.dct._f3d_cache
                )
            dctcg = dataclasses.replace(
                dctcg,
                dct=inner,
                cap_wbox=wbox, cap_cinv=cinv, cap_vx=vx, cap_vy=vy,
                cap_fx=fx, cap_fy=fy, cap_va=va, cap_vb=vb,
            )
        mg = self.mg_solver
        if mg is not None:
            mg = dataclasses.replace(mg, ops=c["mg_ops"])
        ibm = self.ibm
        if ibm is not None:
            masks, w, band, ub, wet, ub_wet = c["ibm"]
            ibm = dataclasses.replace(ibm, masks=masks, w=w, band=band,
                                      ub=ub, wet=wet, ub_wet=ub_wet)
        bound = dataclasses.replace(
            self,
            op=c["op"],
            face_masks=c["face_masks"],
            corr_masks=c["corr_masks"],
            forcing=self.forcing if c["forcing"] is None else c["forcing"],
            scalar_solid=c.get("scalar_solid", self.scalar_solid),
            dct_solver=dct,
            dctcg_solver=dctcg,
            mg_solver=mg,
            ibm=ibm,
        )
        if "fc2d" in c:
            object.__setattr__(bound, "_fc2d_cache", c["fc2d"])
        if "fc3d" in c:
            object.__setattr__(bound, "_fc3d_cache", c["fc3d"])
        if "cut3d" in c:
            object.__setattr__(bound, "_cut3d_dev_cache", c["cut3d"])
        if self.op.ap is not None:
            # the STATIC band/box constants come from the unbound shell's
            # concrete apertures (the bound op.ap is a tracer; the gates
            # call _cut3d_np inside jit)
            object.__setattr__(bound, "_cut3d_np_cache", self._cut3d_np())
        if "dctcg_halo" in c:
            object.__setattr__(bound, "_dctcg_halo", c["dctcg_halo"])
        if "fc3d_halo" in c:
            object.__setattr__(bound, "_fc3d_halo_cache", c["fc3d_halo"])
        if "fc3d_pencil" in c:
            object.__setattr__(bound, "_fc3d_pencil_cache",
                               c["fc3d_pencil"])
        # the unbound (concrete-array) template: adjoint.py needs a
        # tracer-free static to carry across its custom-VJP boundary
        object.__setattr__(bound, "_shell", self)
        # the traced consts pytree itself: adjoint.fused_step re-threads
        # it through the step-level custom-VJP boundary
        object.__setattr__(bound, "_consts_in", c)
        return bound

    def run_scan(self, state: State, n_steps: int) -> tuple[State, StepDiagnostics]:
        """Advance ``n_steps`` inside a single jitted ``lax.scan``.

        Returns the final state and per-step stacked diagnostics. Compiles
        once per (shape, n_steps).
        """
        return _run_scan_jit(self, self._consts(), state, n_steps)

    def run_scan_stats(
        self, state: State, n_steps: int, stats=None
    ) -> tuple[State, StepDiagnostics, "object"]:
        """Advance ``n_steps`` while accumulating running flow statistics
        (time-mean fields + Reynolds stresses; see stats.py).

        The accumulator is carried through the scan -- O(grid) memory, no
        per-step stacking, no host round-trips. Pass the returned ``stats``
        back in to continue accumulating across chunks. Uses the plain
        (jnp/GSPMD) step: the fused whole-step kernels keep the state in an
        internal layout that the center-interpolated moments would have to
        unpack every step anyway.
        """
        from . import stats as stats_mod

        if stats is None:
            stats = stats_mod.init_stats(
                self.grid, with_theta=state.theta is not None
            )
        return _run_scan_stats_jit(self, self._consts(), state, stats, n_steps)


    def run_scan_tracers(
        self, state: State, pos: Array, n_steps: int
    ) -> tuple[State, Array, StepDiagnostics, Array]:
        """Advance ``n_steps`` while advecting Lagrangian tracer particles
        (tracers.py) with the end-of-step velocity and the step's actual
        dt (CFL-adaptive aware). Returns ``(state, pos, diags, traj)``
        with ``traj`` shaped ``(n_steps, n, ndim)`` -- the full particle
        trajectories, stacked on device inside the scan."""
        return _run_scan_tracers_jit(self, self._consts(), state, pos, n_steps)

    def run_scan_forces(
        self, state: State, n_steps: int, box
    ) -> tuple[State, StepDiagnostics, Array, Array]:
        """Advance ``n_steps`` sampling control-volume force terms EVERY
        step (utils/forces.cv_terms_nd over the static cell ``box``).

        Returns ``(state, diags, sf, mom)`` with ``sf``/``mom`` shaped
        ``(n_steps, ndim)``: per-step surface-force and CV-momentum
        series, ready for ``drag_lift_series(dt_sample=dt)``. Chunked
        host-side sampling (the CLI window loop) undersamples a shedding
        period; in-scan sampling costs a few slice reductions per step and
        resolves the full Cd/Cl waveform.
        """
        return _run_scan_forces_jit(
            self, self._consts(), state, n_steps, tuple(int(b) for b in box)
        )


@partial(jax.jit, static_argnums=(0, 4))
def _run_scan_tracers_jit(
    sim: Simulation, consts, state: State, pos: Array, n_steps: int
):
    from . import tracers as tracers_mod

    sim = sim._bind(consts)

    def body(carry, _):
        st, p = carry
        st, diag = sim.step(st)
        p = tracers_mod.advect_tracers(sim.grid, sim.bcs, st.u, p, diag.dt)
        return (st, p), (diag, p)

    (state, pos), (diags, traj) = jax.lax.scan(
        body, (state, pos), xs=None, length=n_steps
    )
    return state, pos, diags, traj


@partial(jax.jit, static_argnums=(0, 3, 4))
def _run_scan_forces_jit(
    sim: Simulation, consts, state: State, n_steps: int, box
):
    from .utils.forces import cv_terms_nd

    sim = sim._bind(consts)

    def body(st, _):
        st, diag = sim.step(st)
        sf, mom = cv_terms_nd(sim.grid, st, sim.params.nu, box)
        return st, (diag, jnp.stack(sf), jnp.stack(mom))

    state, (diags, sf, mom) = jax.lax.scan(
        body, state, xs=None, length=n_steps
    )
    return state, diags, sf, mom


@partial(jax.jit, static_argnums=(0, 4))
def _run_scan_stats_jit(sim: Simulation, consts, state: State, stats, n_steps: int):
    from . import stats as stats_mod

    sim = sim._bind(consts)

    def body(carry, _):
        st, acc = carry
        st, diag = sim.step(st)
        return (st, stats_mod.accumulate(sim.grid, acc, st)), diag

    if sim.diff_solve:
        # same per-step remat as _run_scan_jit's diff branch (memory +
        # the GSPMD uneven-shard residual-stacking NaN fix)
        body = jax.checkpoint(body)
    (state, stats), diags = jax.lax.scan(
        body, (state, stats), xs=None, length=n_steps
    )
    return state, diags, stats


@partial(jax.jit, static_argnums=(0, 3))
def _run_scan_jit(sim: Simulation, consts, state: State, n_steps: int):
    # `sim` is hashable-by-id static; its big arrays arrive via `consts`
    # (traced jit arguments, NOT embedded program constants).
    sim = sim._bind(consts)
    if sim._fused3d_sharded_ok():
        from .parallel.fused_sharded import run_scan_sharded_fused

        rdma = (sim.rdma
                and tuple(sim.shardings.p.mesh.axis_names) == ("sx",)
                and not bcs_mod.has_convective_outlet(sim.grid, sim.bcs))
        return run_scan_sharded_fused(
            sim, sim.shardings.p.mesh, state, n_steps, rdma=rdma
        )
    if (state.t is not None and n_steps > 0
            and sim._fused3d_sharded_timedep_ok()):
        # Time-dependent SHARDED runs (BC values and/or callable body
        # forcing) keep the fused tiers (round 5): per-step resolution
        # inside the sharded scan -- see _fused3d_sharded_timedep_ok.
        # (n_steps == 0 falls through: the exit conversion reads
        # diags.dt[-1].)
        from .parallel.fused_sharded import run_scan_sharded_fused

        return run_scan_sharded_fused(
            sim, sim.shardings.p.mesh, state, n_steps, timedep=True
        )
    if sim.diff_solve:
        # Sharded differentiable runs whose BASE configuration passes the
        # sharded fused whole-step gate keep the slab/pencil fused tiers
        # for the FORWARD scan via a scan-level custom VJP; the backward
        # pass differentiates the jnp GSPMD scan (per-step remat, IFT
        # pressure solves inside) -- adjoint.fused_scan_sharded.
        from . import adjoint

        base = adjoint.base_of(sim._shell)
        if base._fused3d_sharded_ok():
            return adjoint.fused_scan_sharded(sim, state, n_steps)
    # CFL-adaptive fused runs: the corrector kernel's masked max|u_a|/h_a
    # rides the carry and sets the next step's dt (the entry value comes
    # from one jnp reduction over the exact-layout state, outside the loop).
    vel0 = (sim._vel_inv(state.u) if sim.params.cfl is not None
            else jnp.zeros((), sim.grid.dtype))
    if sim._fused2d_ok():
        from .ops import pallas_2d

        iu = pallas_2d.to_internal_2d(sim.grid, state.u)
        itheta = (pallas_2d.pad_theta_2d(sim.grid, state.theta)
                  if state.theta is not None else None)

        def body2d(carry, _):
            st, vel = carry
            st, diag, vel = sim._step_fused2d_internal(st, vel)
            return (st, vel), diag

        (istate, _), diags = jax.lax.scan(
            body2d,
            (State(u=iu, p=state.p, theta=itheta, p_prev=state.p_prev),
             vel0),
            xs=None, length=n_steps,
        )
        u0, u1 = pallas_2d.from_internal_2d(sim.grid, sim.bcs, istate.u)
        n0, n1 = sim.grid.shape
        theta = (istate.theta[:n0, :n1]
                 if istate.theta is not None else None)
        return (
            State(u=(u0, u1), p=istate.p, theta=theta,
                  p_prev=istate.p_prev), diags
        )
    if sim._fused3d_ok():
        # Carry the fused kernels' internal padded layout THROUGH the scan:
        # kernel B's outputs are exactly what kernel A reads, so the
        # pad/slice/concat repacking happens once per scan, not per step.
        from .ops import pallas_kernels

        tile3, _ = sim._tile_db_3d()
        iu = pallas_kernels.to_internal_3d(sim.grid, state.u, tile3)
        itheta = (pallas_kernels.pad_theta_3d(sim.grid, state.theta, tile3)
                  if state.theta is not None else None)

        def body3d(carry, _):
            st, vel = carry
            st, diag, vel = sim._step_fused3d_internal(st, vel)
            return (st, vel), diag

        (istate, _), diags = jax.lax.scan(
            body3d,
            (State(u=iu, p=state.p, theta=itheta, p_prev=state.p_prev),
             vel0),
            xs=None, length=n_steps,
        )
        u0, u1, u2e, face = pallas_kernels.from_internal_3d(
            sim.grid, sim.bcs, istate.u
        )
        u2 = jnp.concatenate([u2e, face], axis=2)
        n0, n1, n2 = sim.grid.shape
        theta = (istate.theta[:n0, :n1, :n2]
                 if istate.theta is not None else None)
        return State(u=(u0, u1, u2), p=istate.p, theta=theta,
                     p_prev=istate.p_prev), diags
    if (state.t is not None and bcs_mod.bcs_time_dependent(sim.bcs)
            and not sim.diff_solve and n_steps > 0
            and sim.grid.ndim == 3 and sim.shardings is None):
        # (n_steps == 0 falls through to the plain scan below: this
        # branch's exit conversion reads diags.dt[-1], which a zero-length
        # scan cannot provide)
        # BC-value-time-dependent fused runs: carry the INTERNAL layout
        # through the scan like the static fused branch above (the
        # per-step _step_timedep -> _step_fused3d route would pay
        # exact<->internal repacking + a full entry BC pass EVERY step).
        # Per step: resolve the callables at the carried t, refresh only
        # the stored own-axis Dirichlet face planes (tangential ghosts
        # are synthesized in-kernel from the hoisted tables), run the
        # internal fused step. CFL runs recompute the entry reduction
        # from the REFRESHED layout (vel_inv_internal_3d) -- the carried
        # corrector reduction predates the refreshed faces, and the jnp
        # route's dt comes from the post-BC field.
        b0, f0 = sim._resolve_timedep(jnp.zeros((), sim.grid.dtype))
        probe = sim._timedep_resolved(b0, f0)
        if probe._fused3d_ok():
            from .ops import pallas_kernels

            tile3, _ = sim._tile_db_3d()
            iu = pallas_kernels.to_internal_3d(sim.grid, state.u, tile3)
            itheta = (pallas_kernels.pad_theta_3d(
                          sim.grid, state.theta, tile3)
                      if state.theta is not None else None)
            fm = sim.face_masks

            def body_td(carry, _):
                st, t = carry
                bt, ft = sim._resolve_timedep(t)
                sim_t = sim._timedep_resolved(bt, ft)
                u_ref = pallas_kernels.refresh_dirichlet_faces_internal_3d(
                    sim.grid, bt, st.u, fm
                )
                vel = (pallas_kernels.vel_inv_internal_3d(
                           sim.grid, bt, u_ref, fm)
                       if sim.params.cfl is not None else None)
                st2, diag, _ = sim_t._step_fused3d_internal(
                    dataclasses.replace(st, u=u_ref), vel
                )
                return (st2, t + diag.dt), diag

            (istate, t_end), diags = jax.lax.scan(
                body_td,
                (State(u=iu, p=state.p, theta=itheta,
                       p_prev=state.p_prev), state.t),
                xs=None, length=n_steps,
            )
            # exit conversion uses the LAST step's resolved values (the
            # per-step route's exact state carries exactly those)
            b_end, _ = sim._resolve_timedep(t_end - diags.dt[-1])
            u0, u1, u2e, face = pallas_kernels.from_internal_3d(
                sim.grid, b_end, istate.u
            )
            u2 = jnp.concatenate([u2e, face], axis=2)
            n0, n1, n2 = sim.grid.shape
            theta = (istate.theta[:n0, :n1, :n2]
                     if istate.theta is not None else None)
            return State(u=(u0, u1, u2), p=istate.p, theta=theta,
                         p_prev=istate.p_prev, t=t_end), diags
    step_fn = sim.make_step_fn()
    if sim.diff_solve:
        # Reverse-mode runs remat each step from its carry (the standard
        # O(1)-residual trade). This is also a CORRECTNESS fix under
        # sharding: without it the scan transpose stacks per-step
        # residuals whose leading grid axis is unevenly sharded (n+1
        # staggered faces over the mesh), and slicing those stacked
        # residuals in the backward scan read GSPMD shard padding --
        # observed as NaN cotangents (3D cavity, cg, >= 2 steps).
        step_fn = jax.checkpoint(step_fn)
    return jax.lax.scan(step_fn, state, xs=None, length=n_steps)


def steady_state_delta(prev: State, new: State, dt: float) -> float:
    """max |u_new - u_prev| / dt -- host-side steady-state check between chunks."""
    d = 0.0
    for a, b in zip(prev.u, new.u):
        d = max(d, float(jnp.max(jnp.abs(a - b))))
    return d / dt
