"""Spectral diagnostics: radial kinetic-energy spectra (periodic domains).

Observability utility beyond the reference's scope: E(k) shells computed
from the FFT of the cell-centered velocity. Host-side numpy (these are
post-processing diagnostics, not step-loop code).
"""

from __future__ import annotations

import numpy as np

from ..grid import GridSpec, interpolate_to_centers


def energy_spectrum_2d(grid: GridSpec, u) -> tuple[np.ndarray, np.ndarray]:
    """Radially binned kinetic-energy spectrum E(k) of a 2D periodic field.

    Returns (k, E) with integer wavenumber shells k = 1..n/2; the total
    0.5 <|u|^2> equals sum(E) by Parseval (up to the interpolation to cell
    centers). Wavenumbers are in box units (k=1 <-> one wavelength per
    domain length)."""
    if grid.ndim != 2:
        raise ValueError("energy_spectrum_2d is 2D only")
    uc, vc = (np.asarray(c) for c in interpolate_to_centers(grid, u))
    nx, ny = uc.shape
    uh = np.fft.fft2(uc) / (nx * ny)
    vh = np.fft.fft2(vc) / (nx * ny)
    e = 0.5 * (np.abs(uh) ** 2 + np.abs(vh) ** 2)
    kx = np.fft.fftfreq(nx, d=1.0 / nx)
    ky = np.fft.fftfreq(ny, d=1.0 / ny)
    kmag = np.sqrt(kx[:, None] ** 2 + ky[None, :] ** 2)
    kmax = min(nx, ny) // 2
    shells = np.arange(1, kmax + 1)
    idx = np.rint(kmag).astype(int)
    # One bincount pass instead of a masked reduction per shell.
    sums = np.bincount(idx.ravel(), weights=e.ravel(), minlength=kmax + 1)
    return shells, sums[1:kmax + 1]


def energy_spectrum_3d(grid: GridSpec, u) -> tuple[np.ndarray, np.ndarray]:
    """Radially binned E(k) of a 3D periodic field (shell-summed |u_hat|^2
    over integer-wavenumber shells, Parseval-consistent like the 2D
    variant)."""
    if grid.ndim != 3:
        raise ValueError("energy_spectrum_3d is 3D only")
    cs = [np.asarray(c) for c in interpolate_to_centers(grid, u)]
    n = cs[0].shape
    vol = n[0] * n[1] * n[2]
    e = np.zeros(n)
    for c in cs:
        e = e + 0.5 * np.abs(np.fft.fftn(c) / vol) ** 2
    ks = [np.fft.fftfreq(m, d=1.0 / m) for m in n]
    kmag = np.sqrt(ks[0][:, None, None] ** 2 + ks[1][None, :, None] ** 2
                   + ks[2][None, None, :] ** 2)
    kmax = min(n) // 2
    shells = np.arange(1, kmax + 1)
    idx = np.rint(kmag).astype(int)
    # One bincount pass over the volume (a masked reduction per shell is
    # O(kmax * n^3) -- multi-second host stalls at 256^3).
    sums = np.bincount(idx.ravel(), weights=e.ravel(), minlength=kmax + 1)
    return shells, sums[1:kmax + 1]


def total_kinetic_energy(grid: GridSpec, u) -> float:
    """0.5 * mean(|u|^2) from the cell-centered field."""
    cs = interpolate_to_centers(grid, u)
    return float(sum(0.5 * np.mean(np.asarray(c) ** 2) for c in cs))
