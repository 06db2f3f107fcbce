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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bcs import BCTable
from ..grid import GridSpec, State
from ..ops import pallas_kernels as pk

Array = jax.Array
AXIS = "sx"


def build_face_codes_halo(grid: GridSpec, face_masks, corr_masks,
                          mesh: Mesh, tile=None):
    """Per-shard uint8 face-code blocks for the slab halo layout, or None
    without obstacles: shard k's block rows [0, b) hold its local codes;
    comp 0 additionally carries row b = the shared face (k+1)*b's code
    (the kernels' (T+1)-row code windows cover the in-register shared-face
    star / divergence at the last data stripe; the last shard's row b is
    the domain-boundary face n0). Codes are loop-invariant, so they are
    packed ONCE at build time from the concrete masks (numpy) -- no
    per-step ghost exchange -- and threaded as jit args via
    Simulation._consts like the unsharded fc3d codes."""
    if face_masks is None and corr_masks is None:
        return None
    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    SC = pk._code_sublanes(local_grid)
    out = []
    for a in range(3):
        vol = pk._face_code_volume(grid, face_masks, corr_masks, a)
        rows = b + 1 if a == 0 else b
        blocks = np.zeros((n_dev, RP, SC, L), np.uint8)
        for k in range(n_dev):
            blk = vol[k * b: k * b + rows]
            blocks[k, : blk.shape[0], : vol.shape[1], : vol.shape[2]] = blk
        out.append(jnp.asarray(blocks.reshape(n_dev * RP, SC, L)))
    return tuple(out)


def forcing_to_halo(grid: GridSpec, bcs: BCTable, fields, mesh: Mesh,
                    tile=None):
    """Spatially-varying per-face forcing volumes (jnp predictor
    convention, solver._forcing_fields_exact) -> per-shard slab halo
    blocks for the fused predictor's forced operand set. Shard k's comp-0
    block carries rows [0, b] = global faces [k*b, k*b+b] (the comp-0
    read spans T+1 rows: the last data stripe's in-register shared-face
    star needs face (k+1)*b's forcing; the last shard's row b is the
    BC-overwritten boundary face -- zeros). Cell comps carry their local
    rows. Loop-invariant: packed once, hoisted out of the scan."""
    from ..bcs import periodic_axes

    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    n0, n1, n2 = grid.shape
    per = periodic_axes(grid, bcs)
    out = []
    for a, f in enumerate(fields):
        # full faces along the own axis (boundary faces zero / wrapped),
        # mirroring pallas_kernels.forcing_to_internal_3d
        if per[a]:
            idx = [slice(None)] * 3
            idx[a] = slice(0, 1)
            f = jnp.concatenate([f, f[tuple(idx)]], axis=a)
        else:
            pad = [(0, 0)] * 3
            pad[a] = (1, 1)
            f = jnp.pad(f, pad)
        rows = b + 1 if a == 0 else b
        S = S1 if a == 1 else S0
        w = min(f.shape[1], S)
        blocks = []
        for k in range(n_dev):
            blk = f[k * b: k * b + rows, :w, :n2]
            blk = jnp.pad(blk, [(0, RP - blk.shape[0]),
                                (0, S - blk.shape[1]),
                                (0, L - blk.shape[2])])
            blocks.append(blk)
        out.append(jnp.concatenate(blocks, axis=0))
    return tuple(out)


def forcing_to_pencil(grid: GridSpec, bcs: BCTable, fields, mesh: Mesh,
                      tile=None):
    """Per-face forcing volumes -> per-shard PENCIL blocks: comp 0
    carries rows [0, b0] (axis-0 shared face), comp 1 carries columns
    [0, m1] (axis-1 shared face -- its in-register shared-face star's
    RHS includes the forcing); ghost slots beyond are zeros (their
    stars never feed kept outputs)."""
    from ..bcs import periodic_axes

    ndx, ndy, b0, m1, local_grid, (T, G, RP, SH, _, L) = _dims_pencil(
        grid, mesh, tile
    )
    n2 = grid.shape[2]
    per = periodic_axes(grid, bcs)
    out = []
    for a, f in enumerate(fields):
        if per[a]:
            idx = [slice(None)] * 3
            idx[a] = slice(0, 1)
            f = jnp.concatenate([f, f[tuple(idx)]], axis=a)
        else:
            pad = [(0, 0)] * 3
            pad[a] = (1, 1)
            f = jnp.pad(f, pad)
        rows = b0 + 1 if a == 0 else b0
        cols = min(m1 + 1 if a == 1 else m1, f.shape[1])
        blocks = []
        for kx in range(ndx):
            row_blocks = []
            for ky in range(ndy):
                blk = f[kx * b0: kx * b0 + rows,
                        ky * m1: ky * m1 + cols, :n2]
                blk = jnp.pad(blk, [(0, RP - blk.shape[0]),
                                    (0, SH - blk.shape[1]),
                                    (0, L - blk.shape[2])])
                row_blocks.append(blk)
            blocks.append(jnp.concatenate(row_blocks, axis=1))
        out.append(jnp.concatenate(blocks, axis=0))
    return tuple(out)


def pad_fluid_code_halo(grid: GridSpec, code, mesh: Mesh, tile=None):
    """ops/poisson uint8 stencil code (cells) -> per-shard halo-layout
    blocks (the fused RHS/divergence masking rides its FLUID_BIT)."""
    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    SC = pk._code_sublanes(local_grid)
    n0, n1, n2 = grid.shape
    x = jnp.asarray(code).reshape(n_dev, b, n1, n2)
    x = jnp.pad(x, [(0, 0), (0, RP - b), (0, SC - n1), (0, L - n2)])
    return x.reshape(n_dev * RP, SC, L)


def build_face_codes_pencil(grid: GridSpec, face_masks, corr_masks,
                            mesh: Mesh, tile=None):
    """Per-shard uint8 face-code blocks for the PENCIL ('sx','sy') halo
    layout, or None without obstacles. Shard (kx,ky)'s block carries its
    local codes; comp 0 additionally carries row b0 (the axis-0 shared
    face, as in the slab builder) and comp 1 carries COLUMN m1 (the
    axis-1 shared face -- the kernels' in-register shared-face star and
    its correction gate on it; the last shard's column m1 is the global
    boundary face n1, whose code keeps the BC-written value open unless
    solid touches the wall). Static, packed once at build time."""
    if face_masks is None and corr_masks is None:
        return None
    ndx, ndy, b0, m1, local_grid, (T, G, RP, SH, _, L) = _dims_pencil(
        grid, mesh, tile
    )
    SC = pk._round_up(SH, 32)
    out = []
    for a in range(3):
        vol = pk._face_code_volume(grid, face_masks, corr_masks, a)
        rows = b0 + 1 if a == 0 else b0
        cols = m1 + 1 if a == 1 else m1
        blocks = np.zeros((ndx, RP, ndy, SC, L), np.uint8)
        for kx in range(ndx):
            for ky in range(ndy):
                blk = vol[kx * b0: kx * b0 + rows,
                          ky * m1: ky * m1 + cols]
                blocks[kx, : blk.shape[0], ky, : blk.shape[1],
                       : blk.shape[2]] = blk
        out.append(jnp.asarray(
            blocks.reshape(ndx * RP, ndy * SC, L)
        ))
    return tuple(out)


def pad_fluid_code_pencil(grid: GridSpec, code, mesh: Mesh, tile=None):
    """ops/poisson uint8 stencil code (cells) -> per-shard pencil-layout
    blocks (local cells only; the fused RHS/divergence masking rides the
    FLUID bit)."""
    ndx, ndy, b0, m1, local_grid, (T, G, RP, SH, _, L) = _dims_pencil(
        grid, mesh, tile
    )
    SC = pk._round_up(SH, 32)
    n2 = grid.shape[2]
    x = jnp.asarray(code).reshape(ndx, b0, ndy, m1, n2)
    x = jnp.pad(x, [(0, 0), (0, RP - b0), (0, 0), (0, SC - m1),
                    (0, L - n2)])
    return x.reshape(ndx * RP, ndy * SC, L)


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
    from ..bcs import BCKind, has_convective_outlet

    if has_convective_outlet(grid, bcs):
        # convective composes on the SLAB tier (round 4) for the axis-0
        # HI outlet only (the production sphere/cylinder topology): the
        # held face rides the carry as a replicated plane, the transport
        # update / Dirichlet-ghost correction are last-shard wrapper
        # fixups. Scalar runs keep the jnp step (theta's conv-face flux
        # is unfused, like unsharded).
        if scalar is not None:
            return False
        others = [
            bcs[(a, s)].kind is BCKind.CONVECTIVE
            for a in range(3) for s in ((0,) if a == 0 else (0, 1))
        ]
        if any(others):
            return False
    return pk.fused_step3d_applicable(grid, bcs)


def sharded_tile_db(grid: GridSpec, mesh: Mesh):
    """(tile, db) for the sharded fused kernels, resolved from the LOCAL
    plane dims -- slab shards keep the GLOBAL plane (split axis 0 only),
    pencil shards split axis 1 over 'sy'. Mirrors the unsharded
    pk.fused_tile_db policy: planes above 128K elements run tile=4
    narrow stripes with double-buffered windows (the tile=8 body's
    register footprint needs ~211M VMEM at 520x512 planes -- see the
    gate note in pk.fused_step3d_applicable), so a 512^3 slab-sharded
    run gets the same narrow-stripe remedy the unsharded tier measured
    (ADVICE r3: without this, slab shards in the (128K, 288K] plane
    window silently took the tile=8 VMEM blowup)."""
    n1 = grid.shape[1]
    if tuple(mesh.axis_names) == (AXIS, AXIS_Y):
        n1 //= int(mesh.devices.shape[1])
    local = GridSpec(
        shape=(grid.shape[0], n1, grid.shape[2]),
        lengths=grid.lengths, dtype=grid.dtype,
    )
    return pk.fused_tile_db(local)


def _dims(grid: GridSpec, mesh: Mesh, tile=None):
    if tile is None:
        tile = sharded_tile_db(grid, mesh)[0]
    n_dev = int(mesh.devices.shape[0])
    b = grid.shape[0] // n_dev
    local_grid = GridSpec(
        shape=(b,) + grid.shape[1:],
        lengths=(b * grid.spacing[0],) + grid.lengths[1:],
        dtype=grid.dtype,
    )
    return n_dev, b, local_grid, pk._halo_dims(local_grid, tile)


def to_internal_halo(grid: GridSpec, u, mesh: Mesh, tile=None):
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


def ibm_to_halo(grid: GridSpec, ibm, mesh: Mesh, tile=None):
    """Exact-layout IBMForcing -> per-shard halo-layout operand volumes
    (round 4: sharded fused IBM). Each per-face volume packs its local
    rows into the shard's block; ghost-slot rows stay ZERO, so
    ``IBMForcing.apply`` on a local block leaves the ghost slots
    untouched (band/wet are zero there) while its axis-0 rolls pick up
    the refreshed neighbor VELOCITY rows -- a band face's interpolation
    neighbor one row over the shard boundary reads the true value.
    Valid for ``fused_ok`` bands (strictly interior globally)."""
    import dataclasses as _dc

    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    n0, n1, n2 = grid.shape

    def blockify(x, S):
        x = x.reshape(n_dev, b, x.shape[1], x.shape[2])
        x = jnp.pad(
            x,
            [(0, 0), (0, RP - b), (0, S - x.shape[2]), (0, L - x.shape[3])],
        )
        return x.reshape(n_dev * RP, S, L)

    def pack(a, x):
        if a == 0:
            return blockify(x[:n0], S0)
        if a == 1:
            return blockify(x, S1)
        return blockify(x[:, :, :n2], S0)

    def pack_t(t):
        return (None if t is None
                else tuple(pack(a, x) for a, x in enumerate(t)))

    return _dc.replace(
        ibm,
        masks=tuple(
            tuple(pack(a, m) for m in ibm.masks[a]) for a in range(3)
        ),
        w=pack_t(ibm.w),
        band=pack_t(ibm.band),
        ub=pack_t(ibm.ub),
        wet=pack_t(ibm.wet),
        ub_wet=pack_t(ibm.ub_wet),
        box=None,   # per-shard blocks: global box offsets don't translate
    )


def from_internal_halo(grid: GridSpec, bcs: BCTable, iu, mesh: Mesh,
                       tile=None):
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


def _probe_resolved_bcs(bcs: BCTable):
    """BC table with callables resolved at t=0.0 (CONCRETE values): the
    structural probe for timedep builds -- kinds and which-slots are
    time-invariant, so structure decisions (conv detection, gate checks)
    read this table."""
    from ..bcs import resolve_bcs

    return resolve_bcs(bcs, 0.0)


def _timedep_slots(bcs: BCTable) -> dict:
    """Deterministic slot order for the per-step resolved BC values: one
    slot per callable velocity entry, keyed (face, component)."""
    td = {}
    for face in sorted(bcs):
        for i, v in enumerate(bcs[face].velocity):
            if callable(v):
                td[(face, i)] = len(td)
    return td


def _timedep_tables(bcs: BCTable, grid: GridSpec, td_slots: dict, bcv):
    """(tg, own, resolved_bcs) rebuilt from the replicated per-step value
    vector ``bcv`` (traced scalars in the callable slots). Traced
    tangential betas arrive from pk._tangential_ghost as ('x2', raw)
    dedupe markers; this jnp-level consumer wants numbers, so they are
    unwrapped here (the kernels re-derive their own tables from the
    resolved bcs and dedupe through the markers)."""
    import dataclasses as _dc

    bt = {}
    for face, spec in bcs.items():
        if any(callable(v) for v in spec.velocity):
            vel = tuple(
                bcv[td_slots[(face, i)]] if callable(v) else v
                for i, v in enumerate(spec.velocity)
            )
            spec = _dc.replace(spec, velocity=vel)
        bt[face] = spec
    tg_t, own_t = pk._ghost_tables(grid, bt)
    tg_t = {
        k: (a, 2.0 * bv[1]
            if (type(bv) is tuple and bv and bv[0] == "x2") else bv)
        for k, (a, bv) in tg_t.items()
    }
    return tg_t, own_t, bt


def make_sharded_fused_step(sim, mesh: Mesh, tile=None,
                            thermal: bool = False,
                            codes=None, fcode=None, ifld=None,
                            rdma: bool = False,
                            ibm_h=None, fluid_x=None,
                            timedep: bool = False):
    """Returns step_fn mapping ((iu0, iu1, iu2), p, theta, p_prev) ->
    (same structure, diag) with the iu arrays in the global halo-mode
    layout sharded over 'sx'. ``thermal`` must reflect whether the scan
    carry actually holds a theta (a scalar-configured sim stepped from a
    theta-less State runs without the scalar, like the unsharded paths).
    ``codes``/``fcode`` (build_face_codes_halo / pad_fluid_code_halo)
    enable obstacle masking: the static per-shard uint8 code blocks ride
    the shard_map as ordinary sharded inputs and stream through the
    kernels' code windows exactly like the unsharded masked path -- no
    per-step code exchange (they are loop-invariant, and only comp 0's
    prefilled shared-face row b is ever read beyond the local rows).

    ``timedep`` (round 5, VERDICT r4 item 3): time-dependent BC VALUES
    through the sharded fused tier. The carry gains the simulation time
    ``t``; each step resolves ``sim.bcs``'s callables at the carried t,
    stacks the resolved traced scalars into one replicated vector that
    rides the shard_map alongside the field blocks, and the bodies
    rebuild the resolved BC table from it (static structure + traced
    values) -- the kernels then hoist those values into their SMEM
    scalar vector exactly like the unsharded timedep path
    (pallas_kernels._hoist_tables). Stored Dirichlet face planes are
    refreshed per step on the GLOBAL halo-layout arrays before the
    shard_map (plain jnp updates; GSPMD keeps them local). Scope v1:
    unmasked, no IBM, no convective outlet, static forcing only
    (solver._fused3d_sharded_timedep_ok gates)."""
    grid, bcs, pr = sim.grid, sim.bcs, sim.params
    db = None
    if tile is None:
        tile, db = sharded_tile_db(grid, mesh)
    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    n1, n2 = grid.shape[1], grid.shape[2]
    tg, own = pk._ghost_tables(
        grid, bcs if not timedep else _probe_resolved_bcs(bcs)
    )
    # timedep: deterministic slot order for the per-step resolved values
    td_slots = _timedep_slots(bcs) if timedep else {}
    # time-dependent body FORCING (round 5): resolved per step and
    # packed to per-shard halo blocks inside the scan (one jnp packing
    # pass per step; the kernels stream the blocks like static fields)
    td_force = (timedep and sim.forcing is not None
                and any(callable(f) for f in sim.forcing))
    if timedep:
        assert td_slots or td_force, \
            "timedep=True but no callable BC/forcing entries"

    def _resolved_tables(bcv):
        """(tg, own, bcs) for this call: the build-time tables, or -- in
        timedep mode -- rebuilt from the replicated per-step resolved
        value vector ``bcv`` (traced scalars in the velocity slots)."""
        if bcv is None:
            return tg, own, bcs
        return _timedep_tables(bcs, grid, td_slots, bcv)
    masked = codes is not None
    forced = ifld is not None or td_force
    # masked + thermal composes (round 4): heated/adiabatic/buoyant
    # obstacles stream their code blocks AND theta through the same
    # kernels as unsharded; the isothermal clamp applies per step on the
    # sharded halo-layout theta (elementwise, no extra exchange).
    body_neumann = False
    solid_halo = None
    if masked and thermal and sim.scalar_solid is not None:
        from ..scalar import ScalarBCKind

        body_neumann = (sim.scalar.body_bc.kind is ScalarBCKind.NEUMANN)
        if not body_neumann:
            solid_halo = theta_to_halo(
                grid, jnp.asarray(sim.scalar_solid, jnp.float32), mesh,
                tile,
            ) > 0.5
    from ..bcs import periodic_axes

    # Periodic sharded axis: the ghost rings CLOSE (wraparound ppermute
    # links) and no shard is an "edge" -- first/last stay False so the
    # halo-mode kernels never synthesize axis-0 BC faces. Global face n0
    # (the periodic duplicate) is trimmed from the layout anyway.
    ring = bool(periodic_axes(grid, bcs)[0])
    spec3 = P(AXIS, None, None)
    pspec = NamedSharding(mesh, spec3)
    # Convective axis-0 HI outlet (round 4): the held face n0 is a STATE
    # -- it rides the scan carry as one replicated (1, S0, L) plane
    # (cface). Per stage the wrapper transport-updates it from the star's
    # inner face, recomputes the last shard's rhs row b-1 (the kernel saw
    # a placeholder face), and the corrector wrapper applies the
    # Dirichlet-ghost pressure correction + folds the excluded
    # diagnostics back in.
    conv = own[(0, 1)][0] == "conv"
    conv_U = float(own[(0, 1)][1]) if conv else 0.0
    # rdma scope: the steady velocity/pressure exchanges (zero ppermutes
    # on that path); the held-convective-face carry and the per-step
    # traced-value tables stay on the ppermute route
    assert not (rdma and (conv or timedep)), \
        "rdma=True does not compose with convective outlets or timedep"
    h0, h1_, h2_ = (float(x) for x in grid.spacing)

    def _bc_rows(a, x):
        """(bc_lo_row, bc_hi_rows): the edge-shard BC synthesis values for
        component ``a``'s lo/hi ghost slots (shared by the ppermute and
        remote-DMA refresh variants)."""
        if a == 0:
            bc_lo = x[0:1]             # apron; face 0 is BC-overwritten
            sp = own[(0, 1)]
            row = (x[b - 1:b] if sp[0] == "copy"
                   else jnp.full((1,) + x.shape[1:], sp[1], x.dtype))
        else:
            al, bl = tg[(a, 0, 0)]
            bc_lo = al * x[0:1] + bl
            ah, bh = tg[(a, 0, 1)]
            row = ah * x[b - 1:b] + bh
        return bc_lo, jnp.concatenate([row, row], axis=0)

    def _rdma_interp():
        if sim.pallas_interpret:
            from jax.experimental.pallas import tpu as pltpu

            return pltpu.InterpretParams()
        return False

    def _refresh_ghosts_rdma(iu, first, last):
        """Remote-DMA ghost refresh (rounds 4-5, VERDICT r3 item 7 / r4
        item 2): ONE Pallas kernel launch issues all six paired
        kernel-initiated ICI transfers (three volumes x two directions,
        parallel/remote_dma.exchange_rows_multi) instead of jnp-level
        ppermutes -- every message is in flight before any wait. Edge
        shards' BC rows are STAGED into the ghost slots first; the
        kernel preserves them (it only overwrites slots an inbound
        message targets). Interpret-runnable on the virtual mesh."""
        from . import remote_dma

        upd = jax.lax.dynamic_update_slice
        staged = []
        for a, x in enumerate(iu):
            if not ring:
                bc_lo, bc_hi = _bc_rows(a, x)
                x = upd(x, jnp.where(last, bc_hi, x[b:b + 2]), (b, 0, 0))
                x = upd(x, jnp.where(first, bc_lo, x[RP - 1:RP]),
                        (RP - 1, 0, 0))
            staged.append(x)
        return tuple(remote_dma.exchange_rows_multi(
            staged, ((b - 1, 1, RP - 1, "fwd"), (0, 2, b, "bwd")),
            AXIS, n_dev, ring, interpret=_rdma_interp(),
        ))

    def _refresh_ghosts(iu, first, last, cface=None, tables=None):
        """Fill each component's ghost slots: ppermute halos at interior
        boundaries, BC synthesis at the true edges (wrap halos everywhere
        on a periodic ring). ``cface``: the field's OWN held convective
        face plane -- the comp-0 hi ghost on the last shard (the stencil
        at row b-1 reads the true carried face n0 value). ``tables``:
        (tg, own) override for the timedep path's per-step resolved
        values (traced betas from the replicated value vector)."""
        tg_, own_ = tables if tables is not None else (tg, own)
        if rdma:
            return _refresh_ghosts_rdma(iu, first, last)
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
                    al, bl = tg_[(a, 0, 0)]
                    bc_lo = al * x[0:1] + bl
                lo = jnp.where(first, bc_lo, lo_halo)
            hi_halo = jax.lax.ppermute(x[0:2], AXIS, _perm_bwd(n_dev, ring))
            if ring:
                hi = hi_halo
            else:
                if a == 0:
                    sp = own_[(0, 1)]
                    if conv and cface is not None:
                        row = cface
                    elif sp[0] == "copy":
                        row = x[b - 1:b]
                    else:
                        row = jnp.full((1,) + x.shape[1:], 0.0, x.dtype) \
                            + jnp.asarray(sp[1], x.dtype)
                else:
                    ah, bh = tg_[(a, 0, 1)]
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

    def _ibm_local(arrs):
        """Per-shard IBMForcing view over the shard_map-delivered operand
        blocks (static dirs/fused_ok come from the ibm_h template)."""
        import dataclasses as _dc

        masks, w, band, ub, wet, ub_wet = arrs
        return _dc.replace(ibm_h, masks=masks, w=w, band=band,
                           ub=ub, wet=wet, ub_wet=ub_wet)

    def pred_body(dt, iu0, iu1, iu2, theta=None, base=None,
                  codes_=None, fc_=None, fld_=None, ibm_=None, flu_=None,
                  cface=None, cface_base=None, bcv=None):
        tg_b, own_b, bcs_b = _resolved_tables(bcv)
        tbl = (tg_b, own_b) if bcv is not None else None
        idx = jax.lax.axis_index(AXIS)
        first = (idx == 0) & (not ring)
        last = (idx == n_dev - 1) & (not ring)
        iu = _refresh_ghosts((iu0, iu1, iu2), first, last, cface=cface,
                             tables=tbl)
        if ibm_ is not None and base is None:
            # step/stage entry: re-impose the interpolated surface values
            # the previous correction perturbed (jnp step's bcs+ibm entry
            # pass). Band faces near shard boundaries interpolate from
            # the just-refreshed ghost rows; the apply leaves ghost slots
            # untouched (band/wet are zero there), and the kernels read
            # only rows whose ghosts mirror PRE-apply neighbor data one
            # row past the band -- outside it, where apply is identity.
            iu = _refresh_ghosts(_ibm_local(ibm_).apply(iu), first, last,
                                 cface=cface)
        if base is not None:
            # rk2 stage 2: the base (step-start) field streams through the
            # same stripe windows -- its ghost slots need the same refresh
            # so the in-register shared-face star anchors correctly
            base = _refresh_ghosts(base, first, last, cface=cface_base,
                                   tables=tbl)
            if ibm_ is not None:
                base = _refresh_ghosts(
                    _ibm_local(ibm_).apply(base), first, last,
                    cface=cface_base,
                )
        ff = (first.astype(jnp.float32), last.astype(jnp.float32))
        us, rhs = pk.predictor_rhs_3d_internal(
            local_grid, bcs_b, iu, dt, pr.nu, pr.upwind_gamma, rho=pr.rho,
            tile=tile, db=db, interpret=sim.pallas_interpret,
            halo=True, edge_flags=ff, base=base,
            forcing=sim._static_forcing(),
            forcing_fields=fld_,
            theta=theta,
            buoyancy=scalar.buoyancy if scalar is not None else None,
            theta_ref=scalar.theta_ref if scalar is not None else 0.0,
            face_codes=codes_, fluid_code=fc_,
        )
        if ibm_ is not None:
            # direct forcing on u* between the kernels (every projection
            # stage, like the jnp _project), with the Poisson RHS patched
            # by the forcing delta's divergence. The comp-0 delta at the
            # SHARED face row b rides one ppermute (the neighbor's row-0
            # delta feeds cell b-1's divergence); zero at the true domain
            # edge (fused_ok bands are strictly interior).
            from .. import ibm as ibm_mod

            op_ibm = _ibm_local(ibm_)
            us = _refresh_ghosts(us, first, last)
            usf = op_ibm.apply(us)
            d0 = usf[0] - us[0]
            d0_hi = jax.lax.ppermute(
                d0[0:1], AXIS, _perm_bwd(n_dev, ring)
            )
            if not ring:
                d0_hi = jnp.where(last, jnp.zeros_like(d0_hi), d0_hi)
            usf0p = jax.lax.dynamic_update_slice(
                us[0] + d0, d0_hi + us[0][b:b + 1], (b, 0, 0)
            )
            rhs = ibm_mod.fused_rhs_patch(
                local_grid, rhs, us, (usf0p, usf[1], usf[2]),
                pr.rho / dt, flu_,
            )
            us = (usf0p, usf[1], usf[2])
        plane = None
        if conv:
            # convective transport update of the held face (last shard):
            # u_b <- u_b - C (u_b - u*_inner), C = U dt/h0, anchored at
            # the STEP-START face (cface_base for rk2's based stage 2);
            # then recompute the last shard's rhs row b-1 (the kernel saw
            # a placeholder face value there)
            oldf = cface_base if base is not None else cface
            inner = us[0][b - 1:b]
            C = jnp.clip(
                conv_U * jnp.asarray(dt, jnp.float32) * (1.0 / h0),
                0.0, 1.0,
            )
            plane = oldf - C * (oldf - inner)
            u1p = us[1][b - 1]
            d1 = (u1p[1:n1 + 1, :n2] - u1p[:n1, :n2]) * (1.0 / h1_)
            u2v = us[2][b - 1][:n1, :n2]
            sp2 = own[(2, 1)]
            if sp2[0] == "copy":
                hi2 = u2v[:, n2 - 1:n2]
            elif sp2[0] == "wrap":
                hi2 = u2v[:, 0:1]
            else:
                hi2 = jnp.full((n1, 1), sp2[1], u2v.dtype)
            d2 = (jnp.concatenate([u2v[:, 1:], hi2], axis=1) - u2v) \
                * (1.0 / h2_)
            d0p = (plane[0, :n1, :n2] - inner[0, :n1, :n2]) * (1.0 / h0)
            plane_rhs = (d1 + d2 + d0p) \
                * (jnp.asarray(pr.rho, jnp.float32) / dt)
            if fc_ is not None:
                fl = ((fc_[b - 1, :n1, :n2] >> 6) & 1)
                plane_rhs = plane_rhs * fl.astype(plane_rhs.dtype)
            rhs = rhs.at[b - 1].set(
                jnp.where(last, plane_rhs, rhs[b - 1])
            )
        # the corrector's divergence diagnostic needs the corrected SHARED
        # face: exchange the neighbor's fresh face-0 star into row b
        if not ring:
            sp = own_b[(0, 1)]
            if conv:
                bc_row = plane
            elif sp[0] == "copy":
                bc_row = us[0][b - 1:b]
            else:
                bc_row = (jnp.zeros((1, S0, L), us[0].dtype)
                          + jnp.asarray(sp[1], us[0].dtype))
        if rdma:
            # kernel-initiated variant: stage the BC row, one bwd message
            from . import remote_dma

            x = us[0]
            if not ring:
                x = jax.lax.dynamic_update_slice(
                    x, jnp.where(last, bc_row, x[b:b + 1]), (b, 0, 0)
                )
            us0 = remote_dma.exchange_rows_multi(
                (x,), ((0, 1, b, "bwd"),), AXIS, n_dev, ring,
                interpret=_rdma_interp(),
            )[0]
        else:
            hi_halo = jax.lax.ppermute(
                us[0][0:1], AXIS, _perm_bwd(n_dev, ring)
            )
            hi = hi_halo if ring else jnp.where(last, bc_row, hi_halo)
            us0 = jax.lax.dynamic_update_slice(us[0], hi, (b, 0, 0))
        return us0, us[1], us[2], rhs

    def corr_body(dt, us0, us1, us2, p_local, theta=None,
                  codes_=None, fc_=None, bcv=None):
        _, _, bcs_b = _resolved_tables(bcv)
        idx = jax.lax.axis_index(AXIS)
        first = (idx == 0) & (not ring)
        last = (idx == n_dev - 1) & (not ring)
        ff = (first.astype(jnp.float32), last.astype(jnp.float32))
        if rdma:
            # kernel-initiated pressure halo fill: zero slots staged (the
            # bounded edges' correct contents -- faces are BC-preserved),
            # one fwd + one bwd message in one launch
            from . import remote_dma

            z1 = jnp.zeros_like(p_local[0:1])
            pbuf = jnp.concatenate(
                [z1, p_local,
                 jnp.zeros((RP + 1 - b,) + p_local.shape[1:],
                           p_local.dtype)],
                axis=0,
            )
            pp = remote_dma.exchange_rows_multi(
                (pbuf,), ((b, 1, 0, "fwd"), (1, 1, b + 1, "bwd")),
                AXIS, n_dev, ring, interpret=_rdma_interp(),
            )[0]
        else:
            lo_halo = jax.lax.ppermute(
                p_local[b - 1:b], AXIS, _perm_fwd(n_dev, ring)
            )
            hi_halo = jax.lax.ppermute(
                p_local[0:1], AXIS, _perm_bwd(n_dev, ring)
            )
            if ring:
                lo, hi = lo_halo, hi_halo   # wrap gradient at seam faces
            else:
                zrow = jnp.zeros_like(p_local[0:1])
                lo = jnp.where(first, zrow, lo_halo)   # edge: zero pad,
                hi = jnp.where(last, zrow, hi_halo)    # faces BC-preserved
            pp = jnp.concatenate(
                [lo, p_local, hi,
                 jnp.zeros((RP - b,) + p_local.shape[1:], p_local.dtype)],
                axis=0,
            )
        pp = jnp.pad(pp, [(0, 0), (0, S0 - n1), (0, L - n2)])
        if theta is not None:
            theta = _refresh_theta_ghosts(theta, first, last)
        res = pk.correct_diag_3d_internal(
            local_grid, bcs_b, (us0, us1, us2), p_local, dt / pr.rho,
            tile=tile, db=db, interpret=sim.pallas_interpret,
            halo=True, edge_flags=ff, pp=pp,
            theta=theta,
            scalar_cfg=scalar if theta is not None else None,
            dt=dt if theta is not None else None,
            face_codes=codes_, fluid_code=fc_,
            body_neumann=body_neumann,
            conv_last=conv,
        )
        if theta is not None:
            iu_new, divp, velp, theta_new = res
        else:
            iu_new, divp, velp = res
            theta_new = None
        divl = jnp.max(divp)
        vell = jnp.max(velp)
        iu0n, iu1n, iu2n = iu_new
        cface_new = None
        if conv:
            # Dirichlet-ghost pressure correction of the held face on the
            # last shard (the jnp step's correct_convective_faces), then
            # fold the kernel-excluded diagnostics back in and write the
            # corrected face into the out row b (the margin stripe zeroed
            # it). The plane psums to a REPLICATED carry entry.
            stage_face = us0[b:b + 1]
            pedge = jnp.pad(
                p_local[b - 1:b], [(0, 0), (0, S0 - n1), (0, L - n2)]
            )
            scale = jnp.asarray(dt, jnp.float32) / pr.rho
            plane_c = stage_face + (2.0 * scale * (1.0 / h0)) * pedge
            iu0n = jax.lax.dynamic_update_slice(
                iu0n, jnp.where(last, plane_c, iu0n[b:b + 1]), (b, 0, 0)
            )
            vell = jnp.maximum(
                vell,
                jnp.where(
                    last,
                    jnp.max(jnp.abs(plane_c[0, :n1, :n2])) * (1.0 / h0),
                    0.0,
                ),
            )
            u1p = iu1n[b - 1]
            d1 = (u1p[1:n1 + 1, :n2] - u1p[:n1, :n2]) * (1.0 / h1_)
            u2v = iu2n[b - 1][:n1, :n2]
            sp2 = own[(2, 1)]
            if sp2[0] == "copy":
                hi2 = u2v[:, n2 - 1:n2]
            elif sp2[0] == "wrap":
                hi2 = u2v[:, 0:1]
            else:
                hi2 = jnp.full((n1, 1), sp2[1], u2v.dtype)
            d2 = (jnp.concatenate([u2v[:, 1:], hi2], axis=1) - u2v) \
                * (1.0 / h2_)
            d0p = (plane_c[0, :n1, :n2] - iu0n[b - 1, :n1, :n2]) \
                * (1.0 / h0)
            dplane = d1 + d2 + d0p
            if fc_ is not None:
                fl = ((fc_[b - 1, :n1, :n2] >> 6) & 1)
                dplane = dplane * fl.astype(dplane.dtype)
            divl = jnp.maximum(
                divl,
                jnp.where(last, jnp.max(jnp.abs(dplane)), 0.0),
            )
            cface_new = jax.lax.psum(
                jnp.where(last, plane_c, jnp.zeros_like(plane_c)), AXIS
            )
        divm = jax.lax.pmax(divl, AXIS)
        velm = jax.lax.pmax(vell, AXIS)
        outs = (iu0n, iu1n, iu2n)
        if theta_new is not None:
            outs = outs + (theta_new,)
        outs = outs + (divm, velm)
        if conv:
            outs = outs + (cface_new,)
        return outs

    rk2 = pr.integrator == "rk2"
    sc = P()   # replicated per-step dt scalar

    def _mk_pred(based):
        """shard_map'd predictor over the positional arg layout
        dt, iu x3, [base x3], [theta], [fld x3], [codes x3 + fc],
        [ibm pytree + fluid] -- every optional set rides as ordinary
        sx-sharded inputs (the static blocks are loop-invariant; XLA
        hoists their layout)."""
        n_arr = (3 + (3 if based else 0) + (1 if thermal else 0)
                 + (3 if forced else 0) + (4 if masked else 0))
        with_ibm = ibm_h is not None

        def body(dt, *arrs):
            k = 3
            iu = arrs[0:3]
            base = None
            if based:
                base = arrs[k:k + 3]
                k += 3
            th = None
            if thermal:
                th = arrs[k]
                k += 1
            fl = None
            if forced:
                fl = arrs[k:k + 3]
                k += 3
            cds = fcd = None
            if masked:
                cds = arrs[k:k + 3]
                fcd = arrs[k + 3]
                k += 4
            ib = flu = None
            if with_ibm:
                ib, flu = arrs[k], arrs[k + 1]
                k += 2
            cf = cfb = None
            if conv:
                cf = arrs[k]
                k += 1
                if based:
                    cfb = arrs[k]
                    k += 1
            bcv = None
            if timedep:
                bcv = arrs[k]
                k += 1
            return pred_body(dt, *iu, theta=th, base=base,
                             codes_=cds, fc_=fcd, fld_=fl,
                             ibm_=ib, flu_=flu,
                             cface=cf, cface_base=cfb, bcv=bcv)

        in_specs = (sc,) + (spec3,) * n_arr
        if with_ibm:
            # the ibm operand pytree rides under ONE prefix spec; fluid
            # (cells, exact shape) shards by rows too
            in_specs = in_specs + (spec3, spec3)
        if conv:
            # the held convective face plane(s) are replicated
            in_specs = in_specs + (P(),) * (2 if based else 1)
        if timedep:
            # the per-step resolved BC value vector is replicated
            in_specs = in_specs + (P(),)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=in_specs,
            out_specs=(spec3, spec3, spec3, spec3),
            check_vma=False,
        )

    pred = _mk_pred(based=False)
    pred_based = _mk_pred(based=True) if rk2 else None

    def _mk_corr(with_theta, with_codes):
        """shard_map'd corrector over dt, u* x3, p, [theta], [codes x3 +
        fc] -- any combination (masked + thermal composes)."""
        n_arr = 4 + (1 if with_theta else 0) + (4 if with_codes else 0)

        def body(dt, *arrs):
            us0, us1, us2, p_local = arrs[0:4]
            k = 4
            th = None
            if with_theta:
                th = arrs[k]
                k += 1
            cds = fcd = None
            if with_codes:
                cds = arrs[k:k + 3]
                fcd = arrs[k + 3]
                k += 4
            bcv = arrs[k] if timedep else None
            return corr_body(dt, us0, us1, us2, p_local, theta=th,
                             codes_=cds, fc_=fcd, bcv=bcv)

        out_specs = (spec3,) * (4 if with_theta else 3) + (P(), P())
        if conv:
            out_specs = out_specs + (P(),)   # the corrected face plane
        in_specs = (sc,) + (spec3,) * n_arr
        if timedep:
            in_specs = in_specs + (P(),)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )

    corr = _mk_corr(thermal, masked)
    corr_half = corr
    if rk2 and thermal:
        # the scalar advances once per STEP (full corrector); the half-
        # step correction is velocity-only, like the unsharded rk2 path
        corr_half = _mk_corr(False, masked)

    from ..solver import StepDiagnostics

    dt_cap = jnp.asarray(pr.dt, grid.dtype)

    # timedep plumbing: which own-axis Dirichlet STORED planes hold
    # per-step-resolved (callable-derived) values, and the valid-row mask
    # for exact whole-array reductions over the halo layout (data rows
    # [0, b) per shard block; ghost slots / margin rows excluded).
    def _own_traced(a, side):
        if own[(a, side)][0] != "d":
            return False
        spec = sim.bcs[(a, side)]
        return bool(spec.velocity) and callable(spec.velocity[a])

    if timedep:
        _vrow = (np.arange(n_dev * RP) % RP) < b
        valid_row = jnp.asarray(_vrow)[:, None, None]

    def _refresh_planes(iu, bt):
        """Re-impose per-step-resolved own-axis Dirichlet values on the
        STORED face planes of the global halo-layout arrays (the carry
        holds the previous step's values; tangential ghosts are
        synthesized per step from the resolved tables). Plain jnp on the
        sharded global arrays -- row 0 lives on shard 0, columns/lanes
        are local to every shard, so GSPMD adds no communication.
        Comp 0's hi face n0 and comp 2's hi face n2 are not stored
        (synthesized at exit / in-kernel). Pad regions stay zero."""
        iu0, iu1, iu2 = iu
        upd = jax.lax.dynamic_update_slice
        if _own_traced(0, 0):
            v = jnp.asarray(bt[(0, 0)].velocity[0], iu0.dtype)
            plane = jnp.zeros((1, S0, L), iu0.dtype)
            plane = plane.at[:, :n1, :n2].set(v)
            iu0 = upd(iu0, plane, (0, 0, 0))
        for side, col in ((0, 0), (1, n1)):
            if _own_traced(1, side):
                v = jnp.asarray(bt[(1, side)].velocity[1], iu1.dtype)
                colv = jnp.where(
                    valid_row & (pk._ax_iota((n_dev * RP, 1, L), 2) < n2),
                    v, 0.0,
                ).astype(iu1.dtype)
                iu1 = upd(iu1, colv, (0, col, 0))
        if _own_traced(2, 0):
            v = jnp.asarray(bt[(2, 0)].velocity[2], iu2.dtype)
            lane = jnp.where(
                valid_row & (pk._ax_iota((n_dev * RP, S0, 1), 1) < n1),
                v, 0.0,
            ).astype(iu2.dtype)
            iu2 = upd(iu2, lane, (0, 0, 0))
        return iu0, iu1, iu2

    def _vel_inv_halo(iu, bt):
        """max_a max|u_a|/h_a over the refreshed halo layout == the jnp
        route's post-BC reduction: data rows masked in, the two
        non-stored hi faces contribute their Dirichlet values
        explicitly ('copy'/'wrap' faces duplicate counted values)."""
        h = grid.spacing
        inv = jnp.asarray(1e-12, iu[0].dtype)
        for a in range(3):
            inv = jnp.maximum(
                inv,
                jnp.max(jnp.where(valid_row, jnp.abs(iu[a]), 0.0)) / h[a],
            )
        for (a, side), hh in (((0, 1), h[0]), ((2, 1), h[2])):
            if own[(a, side)][0] == "d":
                inv = jnp.maximum(
                    inv,
                    jnp.abs(jnp.asarray(bt[(a, side)].velocity[a]
                                        if sim.bcs[(a, side)].velocity
                                        else 0.0, iu[0].dtype)) / hh,
                )
        return inv

    def step_fn(carry):
        t = None
        if timedep:
            *carry, t = carry
            carry = tuple(carry)
        if conv:
            iu, p, theta, p_prev, vel, cface = carry
        else:
            iu, p, theta, p_prev, vel = carry
            cface = None
        bcv = None
        fld_step = None
        if timedep:
            bt, ft = sim._resolve_timedep(t)
            vals = [
                jnp.asarray(bt[face].velocity[i], jnp.float32)
                for (face, i) in sorted(td_slots, key=td_slots.get)
            ]
            # forcing-only timedep runs: static BC tables, dummy vector
            bcv = (jnp.stack(vals) if vals
                   else jnp.zeros((1,), jnp.float32))
            iu = _refresh_planes(iu, bt)
            if pr.cfl is not None:
                # dt from the REFRESHED field, matching the jnp route's
                # post-BC reduction (the carried corrector reduction
                # predates the refreshed planes)
                vel = _vel_inv_halo(iu, bt)
            if td_force:
                # per-step resolved body force -> per-shard halo blocks
                # (one jnp packing pass; streamed like static fields)
                sim_t = sim._timedep_resolved(bt, ft)
                fld_step = forcing_to_halo(
                    grid, bcs, sim_t._forcing_fields_exact(), mesh, tile
                )
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
        fld_args = (tuple(fld_step) if td_force
                    else tuple(ifld) if forced else ())
        code_args = (*codes, fcode) if masked else ()
        ibm_args = ()
        if ibm_h is not None:
            ibm_args = ((ibm_h.masks, ibm_h.w, ibm_h.band,
                         ibm_h.ub, ibm_h.wet, ibm_h.ub_wet), fluid_x)
        extra = (*th_args, *fld_args, *code_args, *ibm_args)
        cf_args = (cface,) if conv else ()
        bcv_args = (bcv,) if timedep else ()
        it_extra = 0
        if rk2:
            # midpoint rule, both stages fused+sharded: stage 1 advances
            # half a step and projects; stage 2 streams the midpoint field
            # as the stencil source anchored at the step-start state
            us0h, us1h, us2h, rhsh = pred(0.5 * dt, *iu, *extra, *cf_args,
                                          *bcv_args)
            ph, it_extra, _ = sim._solve_pressure(rhsh, p_start)
            ph = jax.lax.with_sharding_constraint(ph, pspec)
            ch = corr_half(0.5 * dt, us0h, us1h, us2h, ph, *code_args,
                           *bcv_args)
            iuh = ch[:3]
            # rk2's stage 2 reads the MIDPOINT field's corrected face for
            # its stencils while the transport update stays anchored at
            # the step-start face (cface)
            cf2 = (ch[-1], cface) if conv else ()
            us0, us1, us2, rhs = pred_based(dt, *iuh, *iu, *extra, *cf2,
                                            *bcv_args)
            p_start = ph
        else:
            us0, us1, us2, rhs = pred(dt, *iu, *extra, *cf_args, *bcv_args)
        p_new, iters, res = sim._solve_pressure(rhs, p_start)
        iters = iters + it_extra
        p_new = jax.lax.with_sharding_constraint(p_new, pspec)
        if thermal:
            cres = corr(dt, us0, us1, us2, p_new, theta, *code_args,
                        *bcv_args)
            iu0n, iu1n, iu2n, theta_new, divm, velm = cres[:6]
            if solid_halo is not None:
                # isothermal body: re-clamp solid cells to the body value
                # on the sharded-layout theta (elementwise; GSPMD shards
                # it with zero communication). Adiabatic bodies skip the
                # clamp -- the kernel closed their interface fluxes
                # (body_neumann).
                theta_new = jnp.where(
                    solid_halo,
                    jnp.asarray(sim.scalar.body_bc.value, theta_new.dtype),
                    theta_new,
                )
        else:
            cres = corr(dt, us0, us1, us2, p_new, *code_args, *bcv_args)
            iu0n, iu1n, iu2n, divm, velm = cres[:5]
            theta_new = None
        cface_new = cres[-1] if conv else None
        diag = StepDiagnostics(
            poisson_iters=iters,
            poisson_res=res,
            max_div=divm,
            max_cfl=velm * dt,
            dt=dt,
        )
        p_prev_new = p if p_prev is not None else None
        out_carry = ((iu0n, iu1n, iu2n), p_new, theta_new, p_prev_new,
                     velm)
        if conv:
            out_carry = out_carry + (cface_new,)
        if timedep:
            out_carry = out_carry + (t + dt,)
        return out_carry, diag

    return step_fn


def theta_to_halo(grid: GridSpec, theta, mesh: Mesh, tile=None):
    """Cell-centered scalar -> per-shard halo layout (shard k's block =
    rows [k*RP, (k+1)*RP); ghost slots refreshed per step)."""
    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    x = theta.reshape(n_dev, b, theta.shape[1], theta.shape[2])
    x = jnp.pad(
        x, [(0, 0), (0, RP - b), (0, S0 - x.shape[2]), (0, L - x.shape[3])]
    )
    return x.reshape(n_dev * RP, S0, L)


def theta_from_halo(grid: GridSpec, th, mesh: Mesh, tile=None):
    n_dev, b, local_grid, (T, G, RP, S0, S1, L) = _dims(grid, mesh, tile)
    n0, n1, n2 = grid.shape
    x = th.reshape(n_dev, RP, S0, L)[:, :b, :n1, :n2]
    return x.reshape(n0, n1, n2)


# ---------------------------------------------------------------------------
# Pencil ('sx','sy') mesh: axis-0 halo rows + axis-1 ghost COLUMNS.
# Each shard's block is (RP, SH, L): data rows [0, b0) x sublanes [0, m1),
# axis-0 ghosts as in the slab path, axis-1 hi ghost columns at sublanes
# m1/m1+1 and the lo ghost at SH-1 (the kernels' roll-based axis-1 shifts
# then need no edge fixes -- pallas_kernels halo1 mode). Euler + fixed dt,
# no scalar/obstacles/convective (gate below).
# ---------------------------------------------------------------------------

AXIS_Y = "sy"


def fused_step3d_pencil_applicable(
    grid: GridSpec, bcs: BCTable, mesh: Mesh, scalar=None
) -> bool:
    import jax.numpy as jnp

    from ..bcs import BCKind, has_convective_outlet

    if tuple(mesh.axis_names) != (AXIS, AXIS_Y):
        return False
    ndx, ndy = (int(s) for s in mesh.devices.shape)
    if ndy < 2:
        return False                    # degenerate pencil: use the slab path
    if grid.shape[0] % ndx or grid.shape[1] % ndy:
        return False
    b0, m1 = grid.shape[0] // ndx, grid.shape[1] // ndy
    if b0 < 8 or m1 < 8:
        return False
    if scalar is not None:
        # pencil thermal: theta ghost slots ride both refresh stages; the
        # buoyancy face average must be transverse to BOTH sharded axes
        if pk.theta_ghost_table(scalar, 3) is None:
            return False
        if scalar.buoyancy and (scalar.buoyancy[0] != 0.0
                                or scalar.buoyancy[1] != 0.0):
            return False
    if has_convective_outlet(grid, bcs):
        return False
    if grid.dtype != jnp.float32:
        return False
    if bcs[(0, 0)].kind is BCKind.OUTFLOW:
        return False                    # same LO-outflow gate as unsharded
    # local-plane VMEM gate (the unsharded 128K gate, at pencil scale)
    T, G, RP, SH, _, L = pk._halo_dims_pencil(
        GridSpec(shape=(b0, m1, grid.shape[2]),
                 lengths=(1.0, 1.0, 1.0), dtype=grid.dtype), 8
    )
    if SH * L > 128 * 1024:
        return False
    return pk._scalar_bcs_all_axes(bcs)


def _dims_pencil(grid: GridSpec, mesh: Mesh, tile=None):
    if tile is None:
        tile = sharded_tile_db(grid, mesh)[0]
    ndx, ndy = (int(s) for s in mesh.devices.shape)
    b0 = grid.shape[0] // ndx
    m1 = grid.shape[1] // ndy
    local_grid = GridSpec(
        shape=(b0, m1, grid.shape[2]),
        lengths=(b0 * grid.spacing[0], m1 * grid.spacing[1],
                 grid.lengths[2]),
        dtype=grid.dtype,
    )
    return ndx, ndy, b0, m1, local_grid, \
        pk._halo_dims_pencil(local_grid, tile)


def to_internal_pencil(grid: GridSpec, u, mesh: Mesh, tile=None):
    """Exact global face arrays -> the pencil halo layout, assembled as one
    global array per component: shard (i,j)'s block = rows [i*RP, (i+1)*RP)
    x sublanes [j*SH, (j+1)*SH). Comp 0 trims face n0, comp 1 face n1,
    comp 2 face n2 (re-synthesized on exit from the BC specs)."""
    ndx, ndy, b0, m1, lg, (T, G, RP, SH, _, L) = _dims_pencil(
        grid, mesh, tile
    )
    n0, n1, n2 = grid.shape

    def blockify(x):
        x = x[:n0, :n1, :n2]
        x = x.reshape(ndx, b0, ndy, m1, n2)
        x = jnp.pad(
            x, [(0, 0), (0, RP - b0), (0, 0), (0, SH - m1), (0, L - n2)]
        )
        return x.reshape(ndx * RP, ndy * SH, L)

    return blockify(u[0]), blockify(u[1]), blockify(u[2])


def ibm_to_pencil(grid: GridSpec, ibm, mesh: Mesh, tile=None):
    """Exact-layout IBMForcing -> per-shard PENCIL-layout operand volumes
    (ghost slots zero; see ibm_to_halo -- same contract, both axes)."""
    import dataclasses as _dc

    ndx, ndy, b0, m1, lg, (T, G, RP, SH, _, L) = _dims_pencil(
        grid, mesh, tile
    )
    n0, n1, n2 = grid.shape

    def blockify(x):
        x = x[:n0, :n1, :n2]
        x = x.reshape(ndx, b0, ndy, m1, n2)
        x = jnp.pad(
            x, [(0, 0), (0, RP - b0), (0, 0), (0, SH - m1), (0, L - n2)]
        )
        return x.reshape(ndx * RP, ndy * SH, L)

    def pack_t(t):
        return None if t is None else tuple(blockify(x) for x in t)

    return _dc.replace(
        ibm,
        masks=tuple(
            tuple(blockify(m) for m in ibm.masks[a]) for a in range(3)
        ),
        w=pack_t(ibm.w),
        band=pack_t(ibm.band),
        ub=pack_t(ibm.ub),
        wet=pack_t(ibm.wet),
        ub_wet=pack_t(ibm.ub_wet),
        box=None,   # per-shard blocks: global box offsets don't translate
    )


def from_internal_pencil(grid: GridSpec, bcs: BCTable, iu, mesh: Mesh,
                         tile=None):
    ndx, ndy, b0, m1, lg, (T, G, RP, SH, _, L) = _dims_pencil(
        grid, mesh, tile
    )
    n0, n1, n2 = grid.shape

    def unblock(x):
        x = x.reshape(ndx, RP, ndy, SH, L)[:, :b0, :, :m1, :n2]
        return x.reshape(n0, n1, n2)

    u0i, u1i, u2i = (unblock(x) for x in iu)

    def attach(xi, a):
        spec = pk._own_face_spec(bcs, a, 1)
        sl_last = [slice(None)] * 3
        sl_last[a] = slice(-1, None)
        sl_first = [slice(None)] * 3
        sl_first[a] = slice(0, 1)
        if spec[0] == "copy":
            face = xi[tuple(sl_last)]
        elif spec[0] == "wrap":
            face = xi[tuple(sl_first)]
        else:
            shp = list(xi.shape)
            shp[a] = 1
            face = jnp.full(tuple(shp), spec[1], xi.dtype)
        return jnp.concatenate([xi, face], axis=a)

    return attach(u0i, 0), attach(u1i, 1), attach(u2i, 2)


def make_pencil_fused_step(sim, mesh: Mesh, tile=None,
                           thermal: bool = False,
                           codes=None, fcode=None, ifld=None,
                           ibm_h=None, fluid_x=None,
                           timedep: bool = False):
    """step_fn over the pencil halo layout: ((iu0,iu1,iu2), p, theta,
    p_prev, vel) -> (same, diag). euler/rk2, fixed or CFL dt; ``thermal``
    must reflect whether the carry actually holds a theta.
    ``codes``/``fcode`` (build_face_codes_pencil / pad_fluid_code_pencil)
    enable obstacle masking -- static per-shard blocks with the comp-0
    shared row AND comp-1 shared column prefilled, no per-step
    exchange. ``timedep``: per-step resolved BC VALUES, same contract as
    make_sharded_fused_step (round 5)."""
    grid, bcs, pr = sim.grid, sim.bcs, sim.params
    db = None
    if tile is None:
        tile, db = sharded_tile_db(grid, mesh)
    masked = codes is not None
    td_force = (timedep and sim.forcing is not None
                and any(callable(f) for f in sim.forcing))
    forced = ifld is not None or td_force
    # masked + thermal composes (round 4): same treatment as the slab
    # tier -- code blocks and theta stream together; the isothermal clamp
    # applies per step on the sharded pencil-layout theta.
    body_neumann = False
    solid_halo = None
    if masked and thermal and sim.scalar_solid is not None:
        from ..scalar import ScalarBCKind

        body_neumann = (sim.scalar.body_bc.kind is ScalarBCKind.NEUMANN)
        if not body_neumann:
            solid_halo = theta_to_pencil(
                grid, jnp.asarray(sim.scalar_solid, jnp.float32), mesh,
                tile,
            ) > 0.5
    ndx, ndy, b0, m1, local_grid, (T, G, RP, SH, _, L) = _dims_pencil(
        grid, mesh, tile
    )
    n2 = grid.shape[2]
    tg, own = pk._ghost_tables(
        grid, bcs if not timedep else _probe_resolved_bcs(bcs)
    )
    td_slots = _timedep_slots(bcs) if timedep else {}
    if timedep:
        assert td_slots or td_force, \
            "timedep=True but no callable BC/forcing entries"

    def _resolved_tables(bcv):
        if bcv is None:
            return tg, own, bcs
        return _timedep_tables(bcs, grid, td_slots, bcv)

    from ..bcs import periodic_axes

    per = periodic_axes(grid, bcs)
    ring0 = bool(per[0])
    ring1 = bool(per[1])
    spec3 = P(AXIS, AXIS_Y, None)
    pspec = NamedSharding(mesh, spec3)
    scalar = sim.scalar if thermal else None
    thg = pk.theta_ghost_table(scalar, 3) if scalar is not None else None

    def _refresh_theta(th, first0, last0, first1, last1):
        """Theta's ghost slots, both axes (columns first): scalar-BC
        synthesis at true edges, wrap rings when theta's own BC wraps."""
        r1 = ring1 or thg[(1, 0)][0] == "wrap"
        lo1 = jax.lax.ppermute(th[:, m1 - 1:m1], AXIS_Y, _perm_fwd(ndy, r1))
        hi1 = jax.lax.ppermute(th[:, 0:1], AXIS_Y, _perm_bwd(ndy, r1))
        if not r1:
            lo1 = jnp.where(first1,
                            thg[(1, 0)][1] * th[:, 0:1] + thg[(1, 0)][2],
                            lo1)
            hi1 = jnp.where(last1,
                            thg[(1, 1)][1] * th[:, m1 - 1:m1]
                            + thg[(1, 1)][2], hi1)
        hi1 = jnp.concatenate([hi1, hi1], axis=1)
        th = jax.lax.dynamic_update_slice(th, hi1, (0, m1, 0))
        th = jax.lax.dynamic_update_slice(th, lo1, (0, SH - 1, 0))
        r0 = ring0 or thg[(0, 0)][0] == "wrap"
        lo0 = jax.lax.ppermute(th[b0 - 1:b0], AXIS, _perm_fwd(ndx, r0))
        hi0 = jax.lax.ppermute(th[0:1], AXIS, _perm_bwd(ndx, r0))
        if not r0:
            lo0 = jnp.where(first0,
                            thg[(0, 0)][1] * th[0:1] + thg[(0, 0)][2], lo0)
            hi0 = jnp.where(last0,
                            thg[(0, 1)][1] * th[b0 - 1:b0]
                            + thg[(0, 1)][2], hi0)
        th = jax.lax.dynamic_update_slice(th, hi0, (b0, 0, 0))
        return jax.lax.dynamic_update_slice(th, lo0, (RP - 1, 0, 0))

    def _refresh_cols(iu, first1, last1, tables=None):
        """Axis-1 ghost columns: sy-ppermute halos at interior seams, BC
        synthesis at the true edges (wrap halos on a periodic ring). Slots:
        hi at sublanes [m1, m1+2), lo at SH-1. ``tables``: (tg, own)
        override for the timedep path's per-step resolved values."""
        tg_, own_ = tables if tables is not None else (tg, own)
        out = []
        for a, x in enumerate(iu):
            lo_halo = jax.lax.ppermute(
                x[:, m1 - 1:m1], AXIS_Y, _perm_fwd(ndy, ring1)
            )
            hi_halo = jax.lax.ppermute(
                x[:, 0:2], AXIS_Y, _perm_bwd(ndy, ring1)
            )
            if ring1:
                lo, hi = lo_halo, hi_halo
            else:
                if a == 1:
                    # own-axis: the lo slot only feeds the BC-overwritten
                    # face 0 on the first shard (finite placeholder);
                    # the hi slot is the global face-n1 BC value
                    bc_lo = x[:, 0:1]
                    sp = own_[(1, 1)]
                    row = (x[:, m1 - 1:m1] if sp[0] == "copy"
                           else jnp.zeros_like(x[:, 0:1])
                           + jnp.asarray(sp[1], x.dtype))
                    bc_hi = jnp.concatenate([row, row], axis=1)
                else:
                    al, bl = tg_[(a, 1, 0)]
                    bc_lo = al * x[:, 0:1] + bl
                    ah, bh = tg_[(a, 1, 1)]
                    row = ah * x[:, m1 - 1:m1] + bh
                    bc_hi = jnp.concatenate([row, row], axis=1)
                lo = jnp.where(first1, bc_lo, lo_halo)
                hi = jnp.where(last1, bc_hi, hi_halo)
            x = jax.lax.dynamic_update_slice(x, hi, (0, m1, 0))
            x = jax.lax.dynamic_update_slice(x, lo, (0, SH - 1, 0))
            out.append(x)
        return tuple(out)

    def _refresh_rows(iu, first0, last0, tables=None):
        """Axis-0 ghost rows (slab-path scheme on the SH-wide blocks);
        runs AFTER the column refresh so the exchanged rows carry the
        corner ghost slots."""
        tg_, own_ = tables if tables is not None else (tg, own)
        out = []
        for a, x in enumerate(iu):
            lo_halo = jax.lax.ppermute(
                x[b0 - 1:b0], AXIS, _perm_fwd(ndx, ring0)
            )
            hi_halo = jax.lax.ppermute(x[0:2], AXIS, _perm_bwd(ndx, ring0))
            if ring0:
                lo, hi = lo_halo, hi_halo
            else:
                if a == 0:
                    bc_lo = x[0:1]
                else:
                    al, bl = tg_[(a, 0, 0)]
                    bc_lo = al * x[0:1] + bl
                if a == 0:
                    sp = own_[(0, 1)]
                    row = (x[b0 - 1:b0] if sp[0] == "copy"
                           else jnp.zeros((1,) + x.shape[1:], x.dtype)
                           + jnp.asarray(sp[1], x.dtype))
                else:
                    ah, bh = tg_[(a, 0, 1)]
                    row = ah * x[b0 - 1:b0] + bh
                bc_hi = jnp.concatenate([row, row], axis=0)
                lo = jnp.where(first0, bc_lo, lo_halo)
                hi = jnp.where(last0, bc_hi, hi_halo)
            x = jax.lax.dynamic_update_slice(x, hi, (b0, 0, 0))
            x = jax.lax.dynamic_update_slice(x, lo, (RP - 1, 0, 0))
            out.append(x)
        return tuple(out)

    def _ibm_local(arrs):
        """Per-shard IBMForcing view over the shard_map-delivered operand
        blocks (static dirs/fused_ok come from the ibm_h template)."""
        import dataclasses as _dc

        masks, w, band, ub, wet, ub_wet = arrs
        return _dc.replace(ibm_h, masks=masks, w=w, band=band,
                           ub=ub, wet=wet, ub_wet=ub_wet)

    def _refresh_both(x, first0, last0, first1, last1, tables=None):
        return _refresh_rows(
            _refresh_cols(x, first1, last1, tables=tables), first0, last0,
            tables=tables,
        )

    def pred_body(dt, iu0, iu1, iu2, theta=None, base=None,
                  codes_=None, fc_=None, fld_=None, ibm_=None, flu_=None,
                  bcv=None):
        tg_b, own_b, bcs_b = _resolved_tables(bcv)
        tbl = (tg_b, own_b) if bcv is not None else None
        ix = jax.lax.axis_index(AXIS)
        iy = jax.lax.axis_index(AXIS_Y)
        first0 = (ix == 0) & (not ring0)
        last0 = (ix == ndx - 1) & (not ring0)
        first1 = (iy == 0) & (not ring1)
        last1 = (iy == ndy - 1) & (not ring1)
        iu = _refresh_both((iu0, iu1, iu2), first0, last0, first1, last1,
                           tables=tbl)
        if ibm_ is not None and base is None:
            # step entry: re-impose the interpolated surface values (see
            # the slab pred_body note; the two-stage re-refresh restores
            # post-apply ghosts, corners included)
            iu = _refresh_both(
                _ibm_local(ibm_).apply(iu), first0, last0, first1, last1,
                tables=tbl,
            )
        if base is not None:
            # rk2 stage 2: the step-start field streams through the same
            # windows; its ghost slots need the same two-stage refresh
            base = _refresh_both(base, first0, last0, first1, last1,
                                 tables=tbl)
            if ibm_ is not None:
                base = _refresh_both(
                    _ibm_local(ibm_).apply(base),
                    first0, last0, first1, last1, tables=tbl,
                )
        ff0 = (first0.astype(jnp.float32), last0.astype(jnp.float32))
        ff1 = (first1.astype(jnp.float32), last1.astype(jnp.float32))
        us, rhs = pk.predictor_rhs_3d_internal(
            local_grid, bcs_b, iu, dt, pr.nu, pr.upwind_gamma, rho=pr.rho,
            tile=tile, db=db, interpret=sim.pallas_interpret,
            halo=True, edge_flags=ff0, halo1=True, edge_flags1=ff1,
            base=base,
            forcing=sim._static_forcing(),
            forcing_fields=fld_,
            theta=theta,
            buoyancy=scalar.buoyancy if scalar is not None else None,
            theta_ref=scalar.theta_ref if scalar is not None else 0.0,
            face_codes=codes_, fluid_code=fc_,
        )
        if ibm_ is not None:
            # direct forcing on u* (every projection stage): the comp-0
            # delta at the shared ROW b0 and the comp-1 delta at the
            # shared COLUMN m1 each ride one ppermute into the slots the
            # RHS patch's divergence reads (zero at true domain edges --
            # fused_ok bands are strictly interior)
            from .. import ibm as ibm_mod

            op_ibm = _ibm_local(ibm_)
            us = _refresh_both(us, first0, last0, first1, last1)
            usf = op_ibm.apply(us)
            d0 = usf[0] - us[0]
            d0_hi = jax.lax.ppermute(d0[0:1], AXIS, _perm_bwd(ndx, ring0))
            if not ring0:
                d0_hi = jnp.where(last0, jnp.zeros_like(d0_hi), d0_hi)
            usf0p = jax.lax.dynamic_update_slice(
                us[0] + d0, d0_hi + us[0][b0:b0 + 1], (b0, 0, 0)
            )
            d1 = usf[1] - us[1]
            d1_hi = jax.lax.ppermute(
                d1[:, 0:1], AXIS_Y, _perm_bwd(ndy, ring1)
            )
            if not ring1:
                d1_hi = jnp.where(last1, jnp.zeros_like(d1_hi), d1_hi)
            usf1p = jax.lax.dynamic_update_slice(
                us[1] + d1, d1_hi + us[1][:, m1:m1 + 1], (0, m1, 0)
            )
            rhs = ibm_mod.fused_rhs_patch(
                local_grid, rhs, us, (usf0p, usf1p, usf[2]),
                pr.rho / dt, flu_,
            )
            us = (usf0p, usf1p, usf[2])
        # corrected-shared-face exchanges for the corrector's divergence:
        # axis-0 (comp 0 row b0) and axis-1 (comp 1 column m1)
        hi_halo = jax.lax.ppermute(us[0][0:1], AXIS, _perm_bwd(ndx, ring0))
        if ring0:
            hi0 = hi_halo
        else:
            sp = own_b[(0, 1)]
            bc_row = (us[0][b0 - 1:b0] if sp[0] == "copy"
                      else jnp.zeros((1, SH, L), us[0].dtype)
                      + jnp.asarray(sp[1], us[0].dtype))
            hi0 = jnp.where(last0, bc_row, hi_halo)
        us0 = jax.lax.dynamic_update_slice(us[0], hi0, (b0, 0, 0))
        hi1_halo = jax.lax.ppermute(
            us[1][:, 0:1], AXIS_Y, _perm_bwd(ndy, ring1)
        )
        if ring1:
            hi1 = hi1_halo
        else:
            sp1 = own_b[(1, 1)]
            bc_col = (us[1][:, m1 - 1:m1] if sp1[0] == "copy"
                      else jnp.zeros_like(us[1][:, 0:1])
                      + jnp.asarray(sp1[1], us[1].dtype))
            hi1 = jnp.where(last1, bc_col, hi1_halo)
        us1 = jax.lax.dynamic_update_slice(us[1], hi1, (0, m1, 0))
        return us0, us1, us[2], rhs

    def corr_body(dt, us0, us1, us2, p_local, theta=None,
                  codes_=None, fc_=None, bcv=None):
        _, _, bcs_b = _resolved_tables(bcv)
        ix = jax.lax.axis_index(AXIS)
        iy = jax.lax.axis_index(AXIS_Y)
        first0 = (ix == 0) & (not ring0)
        last0 = (ix == ndx - 1) & (not ring0)
        first1 = (iy == 0) & (not ring1)
        last1 = (iy == ndy - 1) & (not ring1)
        ff0 = (first0.astype(jnp.float32), last0.astype(jnp.float32))
        ff1 = (first1.astype(jnp.float32), last1.astype(jnp.float32))
        # pressure ghosts: columns first (so the exchanged rows carry the
        # corner slots), then rows; open ring ends get zeros (the
        # corresponding corrections are BC-preserved in-kernel)
        zcol = jnp.zeros_like(p_local[:, 0:1])
        lo1 = jax.lax.ppermute(
            p_local[:, m1 - 1:m1], AXIS_Y, _perm_fwd(ndy, ring1)
        )
        hi1 = jax.lax.ppermute(
            p_local[:, 0:1], AXIS_Y, _perm_bwd(ndy, ring1)
        )
        if not ring1:
            lo1 = jnp.where(first1, zcol, lo1)
            hi1 = jnp.where(last1, zcol, hi1)
        pe = jnp.concatenate(
            [p_local, hi1,
             jnp.zeros((b0, SH - m1 - 2, n2), p_local.dtype), lo1],
            axis=1,
        )
        zrow = jnp.zeros_like(pe[0:1])
        lo0 = jax.lax.ppermute(pe[b0 - 1:b0], AXIS, _perm_fwd(ndx, ring0))
        hi0 = jax.lax.ppermute(pe[0:1], AXIS, _perm_bwd(ndx, ring0))
        if not ring0:
            lo0 = jnp.where(first0, zrow, lo0)
            hi0 = jnp.where(last0, zrow, hi0)
        pp = jnp.concatenate(
            [lo0, pe, hi0,
             jnp.zeros((RP - b0,) + pe.shape[1:], pe.dtype)],
            axis=0,
        )
        pp = jnp.pad(pp, [(0, 0), (0, 0), (0, L - n2)])
        if theta is not None:
            theta = _refresh_theta(theta, first0, last0, first1, last1)
        res = pk.correct_diag_3d_internal(
            local_grid, bcs_b, (us0, us1, us2), p_local, dt / pr.rho,
            tile=tile, db=db, interpret=sim.pallas_interpret,
            halo=True, edge_flags=ff0, halo1=True, edge_flags1=ff1,
            pp=pp,
            theta=theta,
            scalar_cfg=scalar if theta is not None else None,
            dt=dt if theta is not None else None,
            face_codes=codes_, fluid_code=fc_,
            body_neumann=body_neumann,
        )
        if theta is not None:
            iu_new, divp, velp, theta_new = res
            divm = jax.lax.pmax(jnp.max(divp), (AXIS, AXIS_Y))
            velm = jax.lax.pmax(jnp.max(velp), (AXIS, AXIS_Y))
            return (iu_new[0], iu_new[1], iu_new[2], theta_new, divm, velm)
        iu_new, divp, velp = res
        divm = jax.lax.pmax(jnp.max(divp), (AXIS, AXIS_Y))
        velm = jax.lax.pmax(jnp.max(velp), (AXIS, AXIS_Y))
        return iu_new[0], iu_new[1], iu_new[2], divm, velm

    rk2 = pr.integrator == "rk2"
    sc = P()

    def _mk_pred(based):
        """Positional layout dt, iu x3, [base x3], [theta], [fld x3],
        [codes x3 + fc], [ibm pytree + fluid] -- mirrors the slab
        builder."""
        n_arr = (3 + (3 if based else 0) + (1 if thermal else 0)
                 + (3 if forced else 0) + (4 if masked else 0))
        with_ibm = ibm_h is not None

        def body(dt, *arrs):
            k = 3
            iu = arrs[0:3]
            base = None
            if based:
                base = arrs[k:k + 3]
                k += 3
            th = None
            if thermal:
                th = arrs[k]
                k += 1
            fl = None
            if forced:
                fl = arrs[k:k + 3]
                k += 3
            cds = fcd = None
            if masked:
                cds = arrs[k:k + 3]
                fcd = arrs[k + 3]
                k += 4
            ib = flu = None
            if with_ibm:
                ib, flu = arrs[k], arrs[k + 1]
                k += 2
            bcv = arrs[k] if timedep else None
            return pred_body(dt, *iu, theta=th, base=base,
                             codes_=cds, fc_=fcd, fld_=fl,
                             ibm_=ib, flu_=flu, bcv=bcv)

        in_specs = (sc,) + (spec3,) * n_arr
        if with_ibm:
            in_specs = in_specs + (spec3, spec3)
        if timedep:
            in_specs = in_specs + (P(),)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=in_specs,
            out_specs=(spec3,) * 4, check_vma=False,
        )

    pred = _mk_pred(based=False)
    pred_based = _mk_pred(based=True) if rk2 else None

    def _mk_corr(with_theta, with_codes):
        """dt, u* x3, p, [theta], [codes x3 + fc] -- any combination
        (masked + thermal composes), mirrors the slab builder."""
        n_arr = 4 + (1 if with_theta else 0) + (4 if with_codes else 0)

        def body(dt, *arrs):
            us0, us1, us2, p_local = arrs[0:4]
            k = 4
            th = None
            if with_theta:
                th = arrs[k]
                k += 1
            cds = fcd = None
            if with_codes:
                cds = arrs[k:k + 3]
                fcd = arrs[k + 3]
                k += 4
            bcv = arrs[k] if timedep else None
            return corr_body(dt, us0, us1, us2, p_local, theta=th,
                             codes_=cds, fc_=fcd, bcv=bcv)

        in_specs = (sc,) + (spec3,) * n_arr
        if timedep:
            in_specs = in_specs + (P(),)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=in_specs,
            out_specs=(spec3,) * (4 if with_theta else 3) + (P(), P()),
            check_vma=False,
        )

    corr = _mk_corr(thermal, masked)
    corr_half = corr
    if rk2 and thermal:
        corr_half = _mk_corr(False, masked)

    from ..solver import StepDiagnostics

    dt_cap = jnp.asarray(pr.dt, grid.dtype)

    # timedep: traced-value stored-plane refresh + exact CFL reduction
    # over the global pencil layout (see the slab builder's twins; here
    # comp 0/1/2's hi faces are ALL elided, so three explicit Dirichlet
    # contributions and three stored lo planes).
    def _own_traced(a, side):
        if own[(a, side)][0] != "d":
            return False
        spec = sim.bcs[(a, side)]
        return bool(spec.velocity) and callable(spec.velocity[a])

    if timedep:
        _vr = (np.arange(ndx * RP) % RP) < b0
        _vs = (np.arange(ndy * SH) % SH) < m1
        valid_row = jnp.asarray(_vr)[:, None, None]
        valid_sub = jnp.asarray(_vs)[None, :, None]

    def _refresh_planes(iu, bt):
        iu0, iu1, iu2 = iu
        upd = jax.lax.dynamic_update_slice
        lane_ok = pk._ax_iota((1, ndy * SH, L), 2) < n2
        if _own_traced(0, 0):
            v = jnp.asarray(bt[(0, 0)].velocity[0], iu0.dtype)
            plane = jnp.where(valid_sub & lane_ok, v, 0.0
                              ).astype(iu0.dtype)
            iu0 = upd(iu0, plane, (0, 0, 0))
        if _own_traced(1, 0):
            v = jnp.asarray(bt[(1, 0)].velocity[1], iu1.dtype)
            col = jnp.where(
                valid_row & (pk._ax_iota((ndx * RP, 1, L), 2) < n2),
                v, 0.0,
            ).astype(iu1.dtype)
            iu1 = upd(iu1, col, (0, 0, 0))
        if _own_traced(2, 0):
            v = jnp.asarray(bt[(2, 0)].velocity[2], iu2.dtype)
            lane = jnp.where(valid_row & valid_sub, v, 0.0
                             ).astype(iu2.dtype)
            iu2 = upd(iu2, lane[:, :, 0:1], (0, 0, 0))
        return iu0, iu1, iu2

    def _vel_inv_pencil(iu, bt):
        h = grid.spacing
        inv = jnp.asarray(1e-12, iu[0].dtype)
        for a in range(3):
            inv = jnp.maximum(
                inv,
                jnp.max(jnp.where(valid_row & valid_sub,
                                  jnp.abs(iu[a]), 0.0)) / h[a],
            )
        for a in range(3):
            if own[(a, 1)][0] == "d":
                inv = jnp.maximum(
                    inv,
                    jnp.abs(jnp.asarray(
                        bt[(a, 1)].velocity[a]
                        if sim.bcs[(a, 1)].velocity else 0.0,
                        iu[0].dtype)) / h[a],
                )
        return inv

    def step_fn(carry):
        t = None
        if timedep:
            iu, p, theta, p_prev, vel, t = carry
        else:
            iu, p, theta, p_prev, vel = carry
        bcv_args = ()
        fld_step = None
        if timedep:
            bt, ft = sim._resolve_timedep(t)
            vals = [
                jnp.asarray(bt[face].velocity[i], jnp.float32)
                for (face, i) in sorted(td_slots, key=td_slots.get)
            ]
            bcv = (jnp.stack(vals) if vals
                   else jnp.zeros((1,), jnp.float32))
            bcv_args = (bcv,)
            iu = _refresh_planes(iu, bt)
            if pr.cfl is not None:
                vel = _vel_inv_pencil(iu, bt)
            if td_force:
                sim_t = sim._timedep_resolved(bt, ft)
                fld_step = forcing_to_pencil(
                    grid, bcs, sim_t._forcing_fields_exact(), mesh, tile
                )
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
        fld_args = (tuple(fld_step) if td_force
                    else tuple(ifld) if forced else ())
        code_args = (*codes, fcode) if masked else ()
        ibm_args = ()
        if ibm_h is not None:
            ibm_args = ((ibm_h.masks, ibm_h.w, ibm_h.band,
                         ibm_h.ub, ibm_h.wet, ibm_h.ub_wet), fluid_x)
        extra = (*th_args, *fld_args, *code_args, *ibm_args)
        it_extra = 0
        if rk2:
            us0h, us1h, us2h, rhsh = pred(0.5 * dt, *iu, *extra,
                                          *bcv_args)
            ph, it_extra, _ = sim._solve_pressure(rhsh, p_start)
            ph = jax.lax.with_sharding_constraint(ph, pspec)
            iuh = corr_half(0.5 * dt, us0h, us1h, us2h, ph, *code_args,
                            *bcv_args)[:3]
            us0, us1, us2, rhs = pred_based(dt, *iuh, *iu, *extra,
                                            *bcv_args)
            p_start = ph
        else:
            us0, us1, us2, rhs = pred(dt, *iu, *extra, *bcv_args)
        p_new, iters, res = sim._solve_pressure(rhs, p_start)
        iters = iters + it_extra
        p_new = jax.lax.with_sharding_constraint(p_new, pspec)
        if thermal:
            iu0n, iu1n, iu2n, theta_new, divm, velm = corr(
                dt, us0, us1, us2, p_new, theta, *code_args, *bcv_args
            )
            if solid_halo is not None:
                # isothermal body: re-clamp solid cells to the body value
                # on the sharded-layout theta (elementwise; GSPMD shards
                # it with zero communication). Adiabatic bodies skip the
                # clamp -- the kernel closed their interface fluxes
                # (body_neumann).
                theta_new = jnp.where(
                    solid_halo,
                    jnp.asarray(sim.scalar.body_bc.value, theta_new.dtype),
                    theta_new,
                )
        else:
            iu0n, iu1n, iu2n, divm, velm = corr(
                dt, us0, us1, us2, p_new, *code_args, *bcv_args
            )
            theta_new = None
        diag = StepDiagnostics(
            poisson_iters=iters,
            poisson_res=res,
            max_div=divm,
            max_cfl=velm * dt,
            dt=dt,
        )
        p_prev_new = p if p_prev is not None else None
        out_carry = ((iu0n, iu1n, iu2n), p_new, theta_new, p_prev_new,
                     velm)
        if timedep:
            out_carry = out_carry + (t + dt,)
        return out_carry, diag

    return step_fn


def theta_to_pencil(grid: GridSpec, theta, mesh: Mesh, tile=None):
    ndx, ndy, b0, m1, lg, (T, G, RP, SH, _, L) = _dims_pencil(
        grid, mesh, tile
    )
    n0, n1, n2 = grid.shape
    x = theta.reshape(ndx, b0, ndy, m1, n2)
    x = jnp.pad(
        x, [(0, 0), (0, RP - b0), (0, 0), (0, SH - m1), (0, L - n2)]
    )
    return x.reshape(ndx * RP, ndy * SH, L)


def theta_from_pencil(grid: GridSpec, th, mesh: Mesh, tile=None):
    ndx, ndy, b0, m1, lg, (T, G, RP, SH, _, L) = _dims_pencil(
        grid, mesh, tile
    )
    n0, n1, n2 = grid.shape
    x = th.reshape(ndx, RP, ndy, SH, L)[:, :b0, :, :m1, :n2]
    return x.reshape(n0, n1, n2)


def run_scan_pencil_fused(sim, mesh: Mesh, state: State, n_steps: int,
                          timedep: bool = False):
    grid, bcs = sim.grid, sim.bcs
    spec3 = NamedSharding(mesh, P(AXIS, AXIS_Y, None))
    iu = tuple(
        jax.lax.with_sharding_constraint(x, spec3)
        for x in to_internal_pencil(grid, state.u, mesh)
    )
    p = jax.lax.with_sharding_constraint(state.p, spec3)
    p_prev = (None if state.p_prev is None
              else jax.lax.with_sharding_constraint(state.p_prev, spec3))
    theta = None
    if sim.scalar is not None and state.theta is not None:
        theta = jax.lax.with_sharding_constraint(
            theta_to_pencil(grid, state.theta, mesh), spec3
        )
    codes = fcode = None
    if sim.face_masks is not None or sim.corr_masks is not None:
        codes, fcode = sim._face_codes_3d_pencil()
        codes = tuple(
            jax.lax.with_sharding_constraint(c, spec3) for c in codes
        )
        fcode = jax.lax.with_sharding_constraint(fcode, spec3)
    ifld = None
    if (sim.forcing is not None and sim._static_forcing() is None
            and not any(callable(f) for f in sim.forcing)):
        # (callable forcing resolves PER STEP inside the timedep scan)
        ifld = tuple(
            jax.lax.with_sharding_constraint(f, spec3)
            for f in forcing_to_pencil(
                grid, bcs, sim._forcing_fields_exact(), mesh
            )
        )
    ibm_h = fluid_x = None
    if sim.ibm is not None:
        import dataclasses as _dc

        cst = jax.lax.with_sharding_constraint
        ibm_h = ibm_to_pencil(grid, sim.ibm, mesh)

        def _cst_t(t):
            return (None if t is None
                    else tuple(cst(x, spec3) for x in t))

        ibm_h = _dc.replace(
            ibm_h,
            masks=tuple(_cst_t(m) for m in ibm_h.masks),
            w=_cst_t(ibm_h.w), band=_cst_t(ibm_h.band),
            ub=_cst_t(ibm_h.ub), wet=_cst_t(ibm_h.wet),
            ub_wet=_cst_t(ibm_h.ub_wet),
        )
        fluid_x = cst(sim.op.fluid, spec3)
    step_fn = make_pencil_fused_step(sim, mesh, thermal=theta is not None,
                                     codes=codes, fcode=fcode, ifld=ifld,
                                     ibm_h=ibm_h, fluid_x=fluid_x,
                                     timedep=timedep)
    vel0 = (sim._vel_inv(state.u) if sim.params.cfl is not None
            else jnp.zeros((), grid.dtype))
    carry = (iu, p, theta, p_prev, vel0)
    if timedep:
        carry = carry + (state.t,)
    carry, diags = jax.lax.scan(
        lambda c, _: step_fn(c), carry, xs=None, length=n_steps,
    )
    t_end = None
    bcs_exit = bcs
    if timedep:
        *carry, t_end = carry
        from ..bcs import resolve_bcs

        bcs_exit = resolve_bcs(bcs, t_end - diags.dt[-1])
    iu, p, theta, p_prev, _ = carry
    u0, u1, u2 = from_internal_pencil(grid, bcs_exit, iu, mesh)
    theta_out = (theta_from_pencil(grid, theta, mesh)
                 if theta is not None else None)
    return State(u=(u0, u1, u2), p=p, theta=theta_out,
                 p_prev=p_prev, t=t_end), diags


def run_scan_sharded_fused(sim, mesh: Mesh, state: State, n_steps: int,
                           rdma: bool = False, timedep: bool = False):
    """The sharded-fused analog of the internal-layout scan in
    solver._run_scan_jit: convert once, scan the fused sharded step,
    convert back. Dispatches to the pencil tier on ('sx','sy') meshes.
    ``rdma=True`` (slab tier, prototype): the velocity ghost refresh runs
    as kernel-initiated remote DMAs (parallel/remote_dma.py) instead of
    jnp ppermutes. ``timedep=True`` (round 5): time-dependent BC VALUES
    resolved per step inside the scan -- see make_sharded_fused_step."""
    if tuple(mesh.axis_names) == (AXIS, AXIS_Y):
        return run_scan_pencil_fused(sim, mesh, state, n_steps,
                                     timedep=timedep)
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
    codes = fcode = None
    if sim.face_masks is not None or sim.corr_masks is not None:
        # built eagerly from the concrete masks and threaded as jit args
        # (Simulation._consts / _bind), like the unsharded fc3d codes
        codes, fcode = sim._face_codes_3d_halo()
        codes = tuple(
            jax.lax.with_sharding_constraint(c, spec3) for c in codes
        )
        fcode = jax.lax.with_sharding_constraint(fcode, spec3)
    ifld = None
    if (sim.forcing is not None and sim._static_forcing() is None
            and not any(callable(f) for f in sim.forcing)):
        # spatially-varying forcing: per-shard slab blocks, loop-invariant
        # (callable forcing resolves PER STEP inside the timedep scan)
        ifld = tuple(
            jax.lax.with_sharding_constraint(f, spec3)
            for f in forcing_to_halo(
                grid, bcs, sim._forcing_fields_exact(), mesh
            )
        )
    ibm_h = fluid_x = None
    if sim.ibm is not None:
        # sharp-interface IBM (round 4): per-shard halo-layout operand
        # volumes, loop-invariant (ghost-slot rows zero -- ibm_to_halo)
        import dataclasses as _dc

        cst = jax.lax.with_sharding_constraint
        ibm_h = ibm_to_halo(grid, sim.ibm, mesh)

        def _cst_t(t):
            return (None if t is None
                    else tuple(cst(x, spec3) for x in t))

        ibm_h = _dc.replace(
            ibm_h,
            masks=tuple(_cst_t(m) for m in ibm_h.masks),
            w=_cst_t(ibm_h.w), band=_cst_t(ibm_h.band),
            ub=_cst_t(ibm_h.ub), wet=_cst_t(ibm_h.wet),
            ub_wet=_cst_t(ibm_h.ub_wet),
        )
        fluid_x = cst(sim.op.fluid, spec3)
    step_fn = make_sharded_fused_step(sim, mesh, thermal=theta is not None,
                                      codes=codes, fcode=fcode, ifld=ifld,
                                      rdma=rdma, ibm_h=ibm_h,
                                      fluid_x=fluid_x, timedep=timedep)
    # CFL-adaptive runs carry the corrector's global max|u_a|/h_a pmax
    # through the scan (entry value from one jnp reduction outside it)
    vel0 = (sim._vel_inv(state.u) if sim.params.cfl is not None
            else jnp.zeros((), grid.dtype))
    carry = (iu, p, theta, p_prev, vel0)
    _, own = pk._ghost_tables(
        grid, bcs if not timedep else _probe_resolved_bcs(bcs)
    )
    conv = own[(0, 1)][0] == "conv"
    if conv:
        # the held convective face n0 is a STATE: it rides the carry as
        # one replicated (1, S0, L) plane
        n_dev, b, lg, (T, G, RP, S0, S1, L) = _dims(grid, mesh)
        n0, n1, n2 = grid.shape
        cface0 = jnp.pad(
            state.u[0][n0:n0 + 1], [(0, 0), (0, S0 - n1), (0, L - n2)]
        )
        carry = carry + (cface0,)
    if timedep:
        assert not conv, "timedep sharded fused excludes convective"
        carry = carry + (state.t,)
    carry, diags = jax.lax.scan(
        lambda c, _: step_fn(c), carry, xs=None, length=n_steps,
    )
    t_end = None
    if timedep:
        *carry, t_end = carry
        carry = tuple(carry)
    if conv:
        iu, p, theta, p_prev, _, cface = carry
    else:
        iu, p, theta, p_prev, _ = carry
    bcs_exit = bcs
    if timedep:
        # exit face synthesis at the LAST step's resolved values (the
        # per-step route's exact state carries exactly those)
        from ..bcs import resolve_bcs

        bcs_exit = resolve_bcs(bcs, t_end - diags.dt[-1])
    u0, u1, u2 = from_internal_halo(grid, bcs_exit, iu, mesh)
    if conv:
        n0, n1, n2 = grid.shape
        u0 = u0.at[n0].set(cface[0, :n1, :n2])
    theta_out = (theta_from_halo(grid, theta, mesh)
                 if theta is not None else None)
    return State(u=(u0, u1, u2), p=p, theta=theta_out, p_prev=p_prev,
                 t=t_end), diags
