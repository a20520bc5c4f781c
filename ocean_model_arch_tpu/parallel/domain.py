"""Shard-divisible domain padding.

The reference pads any nx*ny grid into its block decomposition via the
mmm/nnn frame convention (configs/basinpar.f90:86-89) and drops land-only
blocks. On the TPU mesh the analog is: pad the global extents up to
multiples of the mesh dims with LAND cells (mask 0 -> physics never touches
them; metrics edge-replicated so no zero-divisions appear), run sharded,
and crop on output. Wet-point throughput accounting for the padded/masked
cells lives in parallel/decomposition.py.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core.state import SWState

_MASK_NAMES = {"lu", "lu1", "luu", "luh", "lcu", "lcv", "llu", "llv"}


def padded_extents(nx: int, ny: int, px: int, py: int):
    def up(a, b):
        return -(-a // b) * b
    return up(nx, px), up(ny, py)


def _pad2(a, tx, ty, mode):
    return jnp.pad(a, ((0, tx - a.shape[-2]), (0, ty - a.shape[-1]))
                   if a.ndim == 2 else
                   ((0, 0), (0, tx - a.shape[-2]), (0, ty - a.shape[-1])),
                   mode=mode)


def pad_grid(grid: Grid, px: int, py: int) -> Grid:
    """Pad every 2D grid field to mesh-divisible extents: masks with land
    (zeros), metrics/coordinates edge-replicated (positive, finite)."""
    tx, ty = padded_extents(grid.nx, grid.ny, px, py)
    if (tx, ty) == (grid.nx, grid.ny):
        return grid
    upd = {}
    for f in dataclasses.fields(grid):
        v = getattr(grid, f.name)
        if f.name in _MASK_NAMES:
            upd[f.name] = _pad2(v, tx, ty, "constant")
        elif f.name in ("xt", "xu"):
            upd[f.name] = jnp.pad(v, (0, tx - v.shape[0]), mode="edge")
        elif f.name in ("yt", "yv"):
            upd[f.name] = jnp.pad(v, (0, ty - v.shape[0]), mode="edge")
        elif isinstance(v, jnp.ndarray) and v.ndim >= 2:
            upd[f.name] = _pad2(v, tx, ty, "edge")
    return dataclasses.replace(grid, nx=tx, ny=ty, **upd)


def pad_state(state: SWState, px: int, py: int) -> SWState:
    """Pad every state field with zeros (land values)."""
    ref = state.ssh
    tx, ty = padded_extents(ref.shape[0], ref.shape[1], px, py)
    if (tx, ty) == ref.shape:
        return state
    import jax
    return jax.tree.map(
        lambda a: _pad2(a, tx, ty, "constant") if a.ndim >= 2 else a, state)


def crop_state(state: SWState, nx: int, ny: int) -> SWState:
    """Crop a padded state back to the physical extents."""
    import jax
    return jax.tree.map(
        lambda a: a[..., :nx, :ny] if a.ndim >= 2 else a, state)
