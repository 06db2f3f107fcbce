"""Snapshot / statistics visualization (matplotlib, host-side).

Completes the L6 "I/O & visualization" layer (SURVEY.md SS1): the solver
writes ``.npz`` snapshots (``io.write_snapshot``), statistics
(``stats.npz``) and VTK files; this module renders the npz artifacts to
publication-style PNGs without ParaView. Pure post-processing -- numpy +
matplotlib only, no jax, never on the step-loop path.

Usage:
    python -m navierstokessolver_tpu.viz out/cavity/snap_000100.npz
    python -m navierstokessolver_tpu.viz out/run/stats.npz -o stats.png

or programmatically: ``plot_snapshot(path)``, ``plot_stats(path)``,
``plot_spectrum(k, E)``.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")  # headless: never require a display
    import matplotlib.pyplot as plt

    return plt


def _load_npz(path: str) -> tuple[dict, dict]:
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
        meta = json.loads(str(z["__meta__"])) if "__meta__" in z.files else {}
    return arrays, meta


def _extent(meta: dict, arrays: dict) -> Optional[list]:
    if "lengths" in meta:
        L = meta["lengths"]
        return [0.0, L[0], 0.0, L[1]]
    return None


def plot_snapshot(
    path: str,
    out_png: Optional[str] = None,
    fields: Optional[Sequence[str]] = None,
    dpi: int = 130,
) -> str:
    """Render a snapshot npz to a multi-panel PNG.

    2D: velocity magnitude + streamlines, vorticity, pressure, and theta
    (when present). 3D: mid-plane (z = nz/2) slices of |u|, pressure, and
    Q-criterion. ``fields`` restricts the panel list to the named snapshot
    keys. Returns the written path (default: snapshot path with .png).
    """
    plt = _mpl()
    arrays, meta = _load_npz(path)
    out_png = out_png or os.path.splitext(path)[0] + ".png"
    nd = 3 if "uz" in arrays else 2

    if nd == 2:
        ux, uy = arrays["ux"], arrays["uy"]
        speed = np.hypot(ux, uy)
        panels = [("|u| + streamlines", speed, "viridis")]
        for key, label, cmap in (
            ("vorticity", "vorticity", "RdBu_r"),
            ("p", "pressure", "magma"),
            ("theta", "theta", "inferno"),
            ("streamfunction", "streamfunction", "viridis"),
        ):
            if key in arrays and (fields is None or key in fields):
                panels.append((label, arrays[key], cmap))
        if fields is not None:
            panels = [p for p in panels
                      if p[0].split()[0].strip("|") in fields
                      or p[0] == "|u| + streamlines"]
        ncols = min(len(panels), 2)
        nrows = (len(panels) + ncols - 1) // ncols
        fig, axes = plt.subplots(
            nrows, ncols, figsize=(5.6 * ncols, 4.6 * nrows), squeeze=False
        )
        ext = _extent(meta, arrays)
        for ax, (label, f, cmap) in zip(axes.flat, panels):
            # imshow expects [row, col] = [y, x]; fields are [x, y]
            vmax = float(np.abs(f).max()) or 1.0
            kw = ({"vmin": -vmax, "vmax": vmax} if cmap == "RdBu_r" else {})
            im = ax.imshow(f.T, origin="lower", cmap=cmap, extent=ext,
                           aspect="equal", **kw)
            fig.colorbar(im, ax=ax, shrink=0.85)
            if label.startswith("|u|"):
                nx, ny = ux.shape
                if ext is not None:
                    xs = np.linspace(0, ext[1], nx, endpoint=False) \
                        + 0.5 * ext[1] / nx
                    ys = np.linspace(0, ext[3], ny, endpoint=False) \
                        + 0.5 * ext[3] / ny
                else:
                    xs, ys = np.arange(nx), np.arange(ny)
                ax.streamplot(xs, ys, ux.T, uy.T, color="w",
                              density=1.1, linewidth=0.7, arrowsize=0.8)
            ax.set_title(label)
        for ax in axes.flat[len(panels):]:
            ax.set_visible(False)
    else:
        uz = arrays["uz"]
        kmid = uz.shape[2] // 2
        speed = np.sqrt(sum(arrays[f"u{c}"][..., kmid] ** 2 for c in "xyz"))
        panels = [("|u| (z midplane)", speed, "viridis"),
                  ("pressure (z midplane)", arrays["p"][..., kmid], "magma")]
        if "q_criterion" in arrays:
            panels.append(("Q-criterion (z midplane)",
                           arrays["q_criterion"][..., kmid], "RdBu_r"))
        if "theta" in arrays:
            panels.append(("theta (z midplane)",
                           arrays["theta"][..., kmid], "inferno"))
        if fields is not None:
            panels = [p for p in panels if any(f in p[0] for f in fields)]
        fig, axes = plt.subplots(
            1, len(panels), figsize=(5.6 * len(panels), 4.6), squeeze=False
        )
        ext = _extent(meta, arrays)
        for ax, (label, f, cmap) in zip(axes.flat, panels):
            vmax = float(np.abs(f).max()) or 1.0
            kw = ({"vmin": -vmax, "vmax": vmax} if cmap == "RdBu_r" else {})
            im = ax.imshow(f.T, origin="lower", cmap=cmap, extent=ext,
                           aspect="equal", **kw)
            fig.colorbar(im, ax=ax, shrink=0.85)
            ax.set_title(label)

    title = os.path.basename(path)
    if meta:
        title += f"  (step {meta.get('step', '?')}, t={meta.get('time', 0):.4g})"
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_png, dpi=dpi)
    plt.close(fig)
    return out_png


def plot_stats(
    path: str, out_png: Optional[str] = None, dpi: int = 130
) -> str:
    """Render a ``stats.npz`` (io/cli ``--stats-start`` output) to a PNG:
    mean-velocity fields and the Reynolds-stress diagonal + cross terms."""
    plt = _mpl()
    with np.load(path) as z:
        d = {k: z[k] for k in z.files}
    out_png = out_png or os.path.splitext(path)[0] + ".png"
    nd = sum(1 for k in d if k.startswith("u_mean_"))
    panels = []
    for a in range(nd):
        panels.append((f"mean u{'xyz'[a]}", d[f"u_mean_{a}"], "viridis"))
    for i in range(nd):
        for j in range(i, nd):
            k = f"uu_{i}{j}"
            if k in d:
                panels.append((f"<u{'xyz'[i]}'u{'xyz'[j]}'>", d[k], "magma"))
    if "theta_mean" in d:
        panels.append(("mean theta", d["theta_mean"], "inferno"))

    def midplane(f):
        return f[..., f.shape[2] // 2] if f.ndim == 3 else f

    ncols = min(len(panels), 3)
    nrows = (len(panels) + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(5.0 * ncols, 4.2 * nrows), squeeze=False
    )
    for ax, (label, f, cmap) in zip(axes.flat, panels):
        im = ax.imshow(midplane(f).T, origin="lower", cmap=cmap,
                       aspect="equal")
        fig.colorbar(im, ax=ax, shrink=0.85)
        ax.set_title(label)
    for ax in axes.flat[len(panels):]:
        ax.set_visible(False)
    fig.suptitle(f"{os.path.basename(path)}  (n={int(d['n'])})")
    fig.tight_layout()
    fig.savefig(out_png, dpi=dpi)
    plt.close(fig)
    return out_png


def plot_spectrum(
    k: np.ndarray,
    E: np.ndarray,
    out_png: str,
    dpi: int = 130,
    slope: float = -5.0 / 3.0,
) -> str:
    """Log-log energy spectrum with a k^slope guide line through the
    inertial range (utils/spectra output)."""
    plt = _mpl()
    k = np.asarray(k, float)
    E = np.asarray(E, float)
    fig, ax = plt.subplots(figsize=(5.6, 4.4))
    ax.loglog(k, np.maximum(E, 1e-300), lw=1.4, label="E(k)")
    pos = E > 0
    if pos.sum() >= 3:
        kref = k[pos][max(1, pos.sum() // 4)]
        eref = np.interp(kref, k[pos], E[pos])
        kr = k[(k >= kref) & pos]
        ax.loglog(kr, eref * (kr / kref) ** slope, "k--", lw=0.9,
                  label=f"k^{slope:.2f}")
    ax.set_xlabel("k")
    ax.set_ylabel("E(k)")
    ax.legend()
    ax.grid(True, which="both", alpha=0.25)
    fig.tight_layout()
    fig.savefig(out_png, dpi=dpi)
    plt.close(fig)
    return out_png


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m navierstokessolver_tpu.viz",
        description="Render solver npz artifacts (snapshots, stats) to PNG.",
    )
    ap.add_argument("paths", nargs="+", help="snapshot/stats .npz files")
    ap.add_argument("-o", "--out", default=None,
                    help="output PNG (single input only; default: "
                         "input path with .png)")
    ap.add_argument("--fields", default=None,
                    help="comma-separated snapshot panel filter")
    ap.add_argument("--dpi", type=int, default=130)
    args = ap.parse_args(argv)
    if args.out and len(args.paths) > 1:
        ap.error("-o works with a single input")
    fields = args.fields.split(",") if args.fields else None
    for p in args.paths:
        with np.load(p) as z:
            is_stats = "n" in z.files and "u_mean_0" in z.files
        if is_stats:
            out = plot_stats(p, args.out, dpi=args.dpi)
        else:
            out = plot_snapshot(p, args.out, fields=fields, dpi=args.dpi)
        print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
