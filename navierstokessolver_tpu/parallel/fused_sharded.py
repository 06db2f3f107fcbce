"""Sharded fused whole-step: the internal-layout kernels under shard_map.

Completes VERDICT r1 item 3: multi-chip 3D runs keep the FUSED whole-step
Pallas path (predictor + BC + Poisson-RHS kernel; corrector + BC + diag
kernel), not just the per-component predictor. Design:

  * 1D slab mesh ``('sx',)`` over grid axis 0 -- the BASELINE #5 topology
    (256^3 domain-decomposed).
  * Each shard carries its OWN halo-mode internal layout (B = n0/N data
    rows, hi-ghost slots at rows B/B+1, lo-ghost slot at row RP-1,
    RP = B + T). Ghost slots are refreshed ONCE PER STEP at the jnp level
    inside the shard_map body: a 1-row and a 2-row ``ppermute`` per
    component over ICI, with BC-synthesized rows on the edge shards
    (selected by ``axis_index`` -- SPMD-uniform program). The kernels then
    run with ``halo=True``: no in-kernel axis-0 ghost synthesis, boundary
    -face overwrites gated on (is_first, is_last) scalars.
  * The shared face at each internal boundary is owned by the lower shard;
    the predictor additionally exchanges one row of u* (the neighbor's
    fresh face-0 star) so the corrector's divergence diagnostic sees the
    corrected shared face.
  * The pressure solve runs BETWEEN the two shard_map regions on the
    GSPMD path (mg / fft / cg all compose); entering/leaving shard_map is
    free when layouts match.

The per-step communication is the pure stencil surface: ~4 planes per
component + 2 pressure planes + the solver's own halos.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bcs import BCTable
from ..grid import GridSpec, State
from ..ops import pallas_kernels as pk

Array = jax.Array
AXIS = "sx"


def fused_step3d_sharded_applicable(
    grid: GridSpec, bcs: BCTable, mesh: Mesh, scalar=None
) -> bool:
    if tuple(mesh.axis_names) != (AXIS,):
        return False
    n_dev = int(mesh.devices.shape[0])
    if n_dev < 2 or grid.shape[0] % n_dev:
        return False
    b = grid.shape[0] // n_dev
    if b < 8:
        return False  # degenerate slabs: ghost machinery dominates
    if scalar is not None:
        # sharded thermal: theta halos ride the same ppermute rings; the
        # buoyancy face average must be transverse to the sharded axis
        if pk.theta_ghost_table(scalar, 3) is None:
            return False
        if scalar.buoyancy and scalar.buoyancy[0] != 0.0:
            return False
    from ..bcs import has_convective_outlet

    if has_convective_outlet(grid, bcs):
        # the convective fixups are single-chip wrapper patches
        return False
    return pk.fused_step3d_applicable(grid, bcs)


def _dims(grid: GridSpec, mesh: Mesh, tile: int = 8):
    n_dev = int(mesh.devices.shape[0])
    b = grid.shape[0] // n_dev
    local_grid = GridSpec(
        shape=(b,) + grid.shape[1:],
        lengths=(b * grid.spacing[0],) + grid.lengths[1:],
        dtype=grid.dtype,
    )
    return n_dev, b, local_grid, pk._halo_dims(local_grid, tile)


def to_internal_halo(grid: GridSpec, u, mesh: Mesh, tile: int = 8):
    """Exact global face arrays -> per-shard halo-mode internal layout,
    assembled as one global array per component (shard k's block = rows
    [k*RP, (k+1)*RP)). Called once per scan."""
    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    n0, n1, n2 = grid.shape

    def blockify(x, S):
        x = x.reshape(n_dev, b, x.shape[1], x.shape[2])
        x = jnp.pad(
            x,
            [(0, 0), (0, RP - b), (0, S - x.shape[2]), (0, L - x.shape[3])],
        )
        return x.reshape(n_dev * RP, S, L)

    return (
        blockify(u[0][:n0], S0),
        blockify(u[1], S1),
        blockify(u[2][:, :, :n2], S0),
    )


def from_internal_halo(grid: GridSpec, bcs: BCTable, iu, mesh: Mesh,
                       tile: int = 8):
    """Halo-mode internal layout -> exact global face arrays (re-attaching
    the trimmed comp-0 boundary face and comp-2's elided face from the BC
    specs, like pk.from_internal_3d)."""
    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    n0, n1, n2 = grid.shape

    def unblock(x, w, S):
        x = x.reshape(n_dev, RP, S, L)[:, :b, :w, :n2]
        return x.reshape(n0, w, n2)

    u0i = unblock(iu[0], n1, S0)
    u1 = unblock(iu[1], n1 + 1, S1)
    u2e = unblock(iu[2], n1, S0)
    spec0 = pk._own_face_spec(bcs, 0, 1)
    if spec0[0] == "copy":
        face0 = u0i[n0 - 1:n0]
    elif spec0[0] == "wrap":
        face0 = u0i[0:1]             # periodic duplicate face n0 == face 0
    else:
        face0 = jnp.full((1, n1, n2), spec0[1], u0i.dtype)
    u0 = jnp.concatenate([u0i, face0], axis=0)
    spec2 = pk._own_face_spec(bcs, 2, 1)
    if spec2[0] == "copy":
        face2 = u2e[:, :, n2 - 1:n2]
    elif spec2[0] == "wrap":
        face2 = u2e[:, :, 0:1]       # periodic duplicate face n2 == face 0
    else:
        face2 = jnp.full((n0, n1, 1), spec2[1], u2e.dtype)
    u2 = jnp.concatenate([u2e, face2], axis=2)
    return u0, u1, u2


def _perm_fwd(n, ring: bool = False):
    # ring=True closes the wraparound link (periodic sharded axis)
    return [(k, (k + 1) % n) for k in range(n if ring else n - 1)]


def _perm_bwd(n, ring: bool = False):
    return [((k + 1) % n if ring else k + 1, k)
            for k in range(n if ring else n - 1)]


def make_sharded_fused_step(sim, mesh: Mesh, tile: int = 8,
                            thermal: bool = False):
    """Returns step_fn mapping ((iu0, iu1, iu2), p, theta, p_prev) ->
    (same structure, diag) with the iu arrays in the global halo-mode
    layout sharded over 'sx'. ``thermal`` must reflect whether the scan
    carry actually holds a theta (a scalar-configured sim stepped from a
    theta-less State runs without the scalar, like the unsharded paths)."""
    grid, bcs, pr = sim.grid, sim.bcs, sim.params
    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    n1, n2 = grid.shape[1], grid.shape[2]
    tg, own = pk._ghost_tables(grid, bcs)
    from ..bcs import periodic_axes

    # Periodic sharded axis: the ghost rings CLOSE (wraparound ppermute
    # links) and no shard is an "edge" -- first/last stay False so the
    # halo-mode kernels never synthesize axis-0 BC faces. Global face n0
    # (the periodic duplicate) is trimmed from the layout anyway.
    ring = bool(periodic_axes(grid, bcs)[0])
    spec3 = P(AXIS, None, None)
    pspec = NamedSharding(mesh, spec3)

    def _refresh_ghosts(iu, first, last):
        """Fill each component's ghost slots: ppermute halos at interior
        boundaries, BC synthesis at the true edges (wrap halos everywhere
        on a periodic ring)."""
        out = []
        for a, x in enumerate(iu):
            lo_halo = jax.lax.ppermute(
                x[b - 1:b], AXIS, _perm_fwd(n_dev, ring)
            )
            if ring:
                lo = lo_halo
            else:
                if a == 0:
                    bc_lo = x[0:1]         # apron; face 0 is BC-overwritten
                else:
                    al, bl = tg[(a, 0, 0)]
                    bc_lo = al * x[0:1] + bl
                lo = jnp.where(first, bc_lo, lo_halo)
            hi_halo = jax.lax.ppermute(x[0:2], AXIS, _perm_bwd(n_dev, ring))
            if ring:
                hi = hi_halo
            else:
                if a == 0:
                    sp = own[(0, 1)]
                    row = (x[b - 1:b] if sp[0] == "copy"
                           else jnp.full((1,) + x.shape[1:], sp[1], x.dtype))
                else:
                    ah, bh = tg[(a, 0, 1)]
                    row = ah * x[b - 1:b] + bh
                bc_hi = jnp.concatenate([row, row], axis=0)
                hi = jnp.where(last, bc_hi, hi_halo)
            x = jax.lax.dynamic_update_slice(x, hi, (b, 0, 0))
            x = jax.lax.dynamic_update_slice(x, lo, (RP - 1, 0, 0))
            out.append(x)
        return tuple(out)

    scalar = sim.scalar if thermal else None
    thg = pk.theta_ghost_table(scalar, 3) if scalar is not None else None

    def _refresh_theta_ghosts(th, first, last):
        """Theta's axis-0 ghost rows in the halo layout: ppermuted
        neighbor cells at interior boundaries, scalar-BC synthesis at the
        true edges. A PERIODIC scalar BC closes theta's OWN ring even when
        the velocity axis is wall-bounded (matching pad_scalar)."""
        ring_th = ring or thg[(0, 0)][0] == "wrap"
        lo_halo = jax.lax.ppermute(
            th[b - 1:b], AXIS, _perm_fwd(n_dev, ring_th)
        )
        hi_halo = jax.lax.ppermute(
            th[0:1], AXIS, _perm_bwd(n_dev, ring_th)
        )
        if ring_th:
            lo = lo_halo
            hi = hi_halo
        else:
            bc_lo = thg[(0, 0)][1] * th[0:1] + thg[(0, 0)][2]
            bc_hi = thg[(0, 1)][1] * th[b - 1:b] + thg[(0, 1)][2]
            lo = jnp.where(first, bc_lo, lo_halo)
            hi = jnp.where(last, bc_hi, hi_halo)
        th = jax.lax.dynamic_update_slice(th, hi, (b, 0, 0))
        return jax.lax.dynamic_update_slice(th, lo, (RP - 1, 0, 0))

    def pred_body(dt, iu0, iu1, iu2, theta=None, base=None):
        idx = jax.lax.axis_index(AXIS)
        first = (idx == 0) & (not ring)
        last = (idx == n_dev - 1) & (not ring)
        iu = _refresh_ghosts((iu0, iu1, iu2), first, last)
        if base is not None:
            # rk2 stage 2: the base (step-start) field streams through the
            # same stripe windows -- its ghost slots need the same refresh
            # so the in-register shared-face star anchors correctly
            base = _refresh_ghosts(base, first, last)
        ff = (first.astype(jnp.float32), last.astype(jnp.float32))
        us, rhs = pk.predictor_rhs_3d_internal(
            local_grid, bcs, iu, dt, pr.nu, pr.upwind_gamma, rho=pr.rho,
            tile=tile, interpret=sim.pallas_interpret,
            halo=True, edge_flags=ff, base=base,
            forcing=sim._static_forcing(),
            theta=theta,
            buoyancy=scalar.buoyancy if scalar is not None else None,
            theta_ref=scalar.theta_ref if scalar is not None else 0.0,
        )
        # the corrector's divergence diagnostic needs the corrected SHARED
        # face: exchange the neighbor's fresh face-0 star into row b
        hi_halo = jax.lax.ppermute(
            us[0][0:1], AXIS, _perm_bwd(n_dev, ring)
        )
        if ring:
            hi = hi_halo
        else:
            sp = own[(0, 1)]
            bc_row = (us[0][b - 1:b] if sp[0] == "copy"
                      else jnp.full((1, S0, L), sp[1], us[0].dtype))
            hi = jnp.where(last, bc_row, hi_halo)
        us0 = jax.lax.dynamic_update_slice(us[0], hi, (b, 0, 0))
        return us0, us[1], us[2], rhs

    def corr_body(dt, us0, us1, us2, p_local, theta=None):
        idx = jax.lax.axis_index(AXIS)
        first = (idx == 0) & (not ring)
        last = (idx == n_dev - 1) & (not ring)
        ff = (first.astype(jnp.float32), last.astype(jnp.float32))
        lo_halo = jax.lax.ppermute(
            p_local[b - 1:b], AXIS, _perm_fwd(n_dev, ring)
        )
        hi_halo = jax.lax.ppermute(
            p_local[0:1], AXIS, _perm_bwd(n_dev, ring)
        )
        if ring:
            lo, hi = lo_halo, hi_halo   # wrap gradient at the seam faces
        else:
            zrow = jnp.zeros_like(p_local[0:1])
            lo = jnp.where(first, zrow, lo_halo)   # edge: zero pad, faces
            hi = jnp.where(last, zrow, hi_halo)    # are BC-preserved anyway
        pp = jnp.concatenate(
            [lo, p_local, hi, jnp.zeros((RP - b,) + p_local.shape[1:],
                                        p_local.dtype)],
            axis=0,
        )
        pp = jnp.pad(pp, [(0, 0), (0, S0 - n1), (0, L - n2)])
        if theta is not None:
            theta = _refresh_theta_ghosts(theta, first, last)
        res = pk.correct_diag_3d_internal(
            local_grid, bcs, (us0, us1, us2), p_local, dt / pr.rho,
            tile=tile, interpret=sim.pallas_interpret,
            halo=True, edge_flags=ff, pp=pp,
            theta=theta,
            scalar_cfg=scalar if theta is not None else None,
            dt=dt if theta is not None else None,
        )
        if theta is not None:
            iu_new, divp, velp, theta_new = res
            divm = jax.lax.pmax(jnp.max(divp), AXIS)
            velm = jax.lax.pmax(jnp.max(velp), AXIS)
            return (iu_new[0], iu_new[1], iu_new[2], theta_new,
                    divm, velm)
        iu_new, divp, velp = res
        divm = jax.lax.pmax(jnp.max(divp), AXIS)
        velm = jax.lax.pmax(jnp.max(velp), AXIS)
        return iu_new[0], iu_new[1], iu_new[2], divm, velm

    rk2 = pr.integrator == "rk2"
    sc = P()   # replicated per-step dt scalar
    pred = jax.shard_map(
        pred_body, mesh=mesh,
        in_specs=(sc,) + (spec3,) * (4 if thermal else 3),
        out_specs=(spec3, spec3, spec3, spec3),
        check_vma=False,
    )
    pred_based = None
    if rk2:
        def pred_based_body(dt, iu0, iu1, iu2, b0, b1, b2, theta=None):
            return pred_body(dt, iu0, iu1, iu2, theta=theta,
                             base=(b0, b1, b2))

        pred_based = jax.shard_map(
            pred_based_body, mesh=mesh,
            in_specs=(sc,) + (spec3,) * (7 if thermal else 6),
            out_specs=(spec3, spec3, spec3, spec3),
            check_vma=False,
        )
    corr = jax.shard_map(
        corr_body, mesh=mesh,
        in_specs=(sc,) + (spec3,) * (5 if thermal else 4),
        out_specs=(spec3,) * (4 if thermal else 3) + (P(), P()),
        check_vma=False,
    )
    corr_half = corr
    if rk2 and thermal:
        # the scalar advances once per STEP (full corrector); the half-
        # step correction is velocity-only, like the unsharded rk2 path
        corr_half = jax.shard_map(
            corr_body, mesh=mesh,
            in_specs=(sc,) + (spec3,) * 4,
            out_specs=(spec3,) * 3 + (P(), P()),
            check_vma=False,
        )

    from ..solver import StepDiagnostics

    dt_cap = jnp.asarray(pr.dt, grid.dtype)

    def step_fn(carry):
        iu, p, theta, p_prev, vel = carry
        if pr.cfl is None:
            dt = dt_cap
        else:
            floor = jnp.asarray(1e-12, grid.dtype)
            dt = jnp.minimum(dt_cap, pr.cfl / jnp.maximum(vel, floor))
        beta = pr.poisson.extrapolate
        if beta and p_prev is not None:
            p_start = p + beta * (p - p_prev)
        else:
            p_start = p
        th_args = (theta,) if thermal else ()
        it_extra = 0
        if rk2:
            # midpoint rule, both stages fused+sharded: stage 1 advances
            # half a step and projects; stage 2 streams the midpoint field
            # as the stencil source anchored at the step-start state
            us0h, us1h, us2h, rhsh = pred(0.5 * dt, *iu, *th_args)
            ph, it_extra, _ = sim._solve_pressure(rhsh, p_start)
            ph = jax.lax.with_sharding_constraint(ph, pspec)
            iuh = corr_half(0.5 * dt, us0h, us1h, us2h, ph)[:3]
            us0, us1, us2, rhs = pred_based(dt, *iuh, *iu, *th_args)
            p_start = ph
        else:
            us0, us1, us2, rhs = pred(dt, *iu, *th_args)
        p_new, iters, res = sim._solve_pressure(rhs, p_start)
        iters = iters + it_extra
        p_new = jax.lax.with_sharding_constraint(p_new, pspec)
        if thermal:
            iu0n, iu1n, iu2n, theta_new, divm, velm = corr(
                dt, us0, us1, us2, p_new, theta
            )
        else:
            iu0n, iu1n, iu2n, divm, velm = corr(dt, us0, us1, us2, p_new)
            theta_new = None
        diag = StepDiagnostics(
            poisson_iters=iters,
            poisson_res=res,
            max_div=divm,
            max_cfl=velm * dt,
            dt=dt,
        )
        p_prev_new = p if p_prev is not None else None
        return ((iu0n, iu1n, iu2n), p_new, theta_new, p_prev_new,
                velm), diag

    return step_fn


def theta_to_halo(grid: GridSpec, theta, mesh: Mesh, tile: int = 8):
    """Cell-centered scalar -> per-shard halo layout (shard k's block =
    rows [k*RP, (k+1)*RP); ghost slots refreshed per step)."""
    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    x = theta.reshape(n_dev, b, theta.shape[1], theta.shape[2])
    x = jnp.pad(
        x, [(0, 0), (0, RP - b), (0, S0 - x.shape[2]), (0, L - x.shape[3])]
    )
    return x.reshape(n_dev * RP, S0, L)


def theta_from_halo(grid: GridSpec, th, mesh: Mesh, tile: int = 8):
    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    n0, n1, n2 = grid.shape
    x = th.reshape(n_dev, RP, S0, L)[:, :b, :n1, :n2]
    return x.reshape(n0, n1, n2)


def run_scan_sharded_fused(sim, mesh: Mesh, state: State, n_steps: int):
    """The sharded-fused analog of the internal-layout scan in
    solver._run_scan_jit: convert once, scan the fused sharded step,
    convert back."""
    grid, bcs = sim.grid, sim.bcs
    spec3 = NamedSharding(mesh, P(AXIS, None, None))
    iu = tuple(
        jax.lax.with_sharding_constraint(x, spec3)
        for x in to_internal_halo(grid, state.u, mesh)
    )
    p = jax.lax.with_sharding_constraint(state.p, spec3)
    p_prev = (None if state.p_prev is None
              else jax.lax.with_sharding_constraint(state.p_prev, spec3))
    theta = None
    if sim.scalar is not None and state.theta is not None:
        theta = jax.lax.with_sharding_constraint(
            theta_to_halo(grid, state.theta, mesh), spec3
        )
    step_fn = make_sharded_fused_step(sim, mesh, thermal=theta is not None)
    # CFL-adaptive runs carry the corrector's global max|u_a|/h_a pmax
    # through the scan (entry value from one jnp reduction outside it)
    vel0 = (sim._vel_inv(state.u) if sim.params.cfl is not None
            else jnp.zeros((), grid.dtype))
    (iu, p, theta, p_prev, _), diags = jax.lax.scan(
        lambda c, _: step_fn(c), (iu, p, theta, p_prev, vel0),
        xs=None, length=n_steps,
    )
    u0, u1, u2 = from_internal_halo(grid, bcs, iu, mesh)
    theta_out = (theta_from_halo(grid, theta, mesh)
                 if theta is not None else None)
    return State(u=(u0, u1, u2), p=p, theta=theta_out, p_prev=p_prev), diags
