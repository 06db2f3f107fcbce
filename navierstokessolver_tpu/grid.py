"""Staggered (MAC) grid specification and simulation state.

Capability parity: reference `shivams15/navierstokessolver` "grid/state API"
(SURVEY.md SS2 row "Staggered-grid state"; reference mount was empty this
session -- see SURVEY.md SS0 -- so the contract is the driver's BASELINE.json
capability spec, not file:line citations).

Layout (2D, generalizes to ND):
  * ``u[0]`` (u): x-face normal velocity, shape ``(nx+1, ny)``;
    ``u[0][i, j]`` lives at ``(i*dx, (j+0.5)*dy)``.
  * ``u[1]`` (v): y-face normal velocity, shape ``(nx, ny+1)``.
  * ``p``: cell-centered pressure, shape ``(nx, ny)``.

Everything is a pytree of ``jax.Array``s so the whole time step can live
inside one jit-compiled ``lax.scan`` (no host round-trips), and fields can be
sharded over a device mesh by domain decomposition (SURVEY.md SS5).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static description of a uniform staggered grid.

    Attributes:
      shape:   number of cells per axis, e.g. ``(nx, ny)`` or ``(nx, ny, nz)``.
      lengths: physical domain extent per axis.
      dtype:   field dtype (float32 default; float64 for CPU validation runs
               when ``jax_enable_x64`` is on).
    """

    shape: tuple[int, ...]
    lengths: tuple[float, ...]
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        object.__setattr__(self, "shape", tuple(int(n) for n in self.shape))
        object.__setattr__(self, "lengths", tuple(float(l) for l in self.lengths))
        if len(self.shape) != len(self.lengths):
            raise ValueError(
                f"shape {self.shape} and lengths {self.lengths} rank mismatch"
            )
        if len(self.shape) not in (2, 3):
            raise ValueError("only 2D and 3D grids are supported")
        if any(n < 2 for n in self.shape):
            raise ValueError(f"need >=2 cells per axis, got {self.shape}")

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def spacing(self) -> tuple[float, ...]:
        return tuple(l / n for l, n in zip(self.lengths, self.shape))

    def face_shape(self, axis: int) -> tuple[int, ...]:
        """Shape of the velocity component staggered along ``axis``."""
        s = list(self.shape)
        s[axis] += 1
        return tuple(s)

    def cell_centers(self, axis: int) -> Array:
        """1D coordinates of cell centers along ``axis``."""
        h = self.spacing[axis]
        return (jnp.arange(self.shape[axis], dtype=self.dtype) + 0.5) * h

    def face_coords(self, axis: int) -> Array:
        """1D coordinates of the faces normal to ``axis``."""
        h = self.spacing[axis]
        return jnp.arange(self.shape[axis] + 1, dtype=self.dtype) * h

    def num_cells(self) -> int:
        n = 1
        for s in self.shape:
            n *= s
        return n


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class State:
    """Simulation state: staggered velocity components + cell pressure.

    ``u`` is a tuple with one array per axis (the component normal to that
    axis's faces). ``p`` is cell-centered. ``theta`` is an optional
    cell-centered transported scalar (temperature/concentration; see
    scalar.py) -- ``None`` for pure-momentum runs. Registered as a pytree so
    it can be carried through ``lax.scan`` / ``jit`` / sharding unchanged
    (a ``None`` theta is an empty pytree subtree, so the structure stays
    consistent either way).
    """

    u: tuple[Array, ...]
    p: Array
    theta: Array | None = None
    # Previous step's pressure, carried when PoissonConfig.extrapolate is on
    # (iterative-solve warm start p_guess = 2 p - p_prev); None otherwise.
    p_prev: Array | None = None
    # Physical time, carried (scalar array) ONLY for runs with
    # time-dependent boundary values or forcing (solver.py resolves the
    # callables against it each step); None keeps static runs' pytree
    # structure, checkpoints, and compiled programs unchanged.
    t: Array | None = None

    def tree_flatten(self):
        return (self.u, self.p, self.theta, self.p_prev, self.t), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        u, p, theta, p_prev, t = children
        return cls(u=tuple(u), p=p, theta=theta, p_prev=p_prev, t=t)

    @property
    def ndim(self) -> int:
        return self.p.ndim

    def astype(self, dtype) -> "State":
        return State(
            u=tuple(c.astype(dtype) for c in self.u),
            p=self.p.astype(dtype),
            theta=None if self.theta is None else self.theta.astype(dtype),
            p_prev=None if self.p_prev is None else self.p_prev.astype(dtype),
            t=None if self.t is None else self.t.astype(dtype),
        )


def zero_state(grid: GridSpec) -> State:
    """Quiescent initial state (u = 0, p = 0)."""
    u = tuple(
        jnp.zeros(grid.face_shape(a), dtype=grid.dtype) for a in range(grid.ndim)
    )
    p = jnp.zeros(grid.shape, dtype=grid.dtype)
    return State(u=u, p=p)


def interpolate_to_centers(grid: GridSpec, u: Sequence[Array]) -> tuple[Array, ...]:
    """Average face-normal velocities to cell centers (for output/diagnostics)."""
    out = []
    for a, comp in enumerate(u):
        lo = [slice(None)] * grid.ndim
        hi = [slice(None)] * grid.ndim
        lo[a] = slice(0, -1)
        hi[a] = slice(1, None)
        out.append(0.5 * (comp[tuple(lo)] + comp[tuple(hi)]))
    return tuple(out)
