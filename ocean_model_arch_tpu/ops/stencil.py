"""Stencil access on halo-padded arrays — the kernel-layer calling convention.

Design: every physics kernel is a pure function over 2D arrays carrying a
``HALO``-cell ghost frame on all sides (shape ``(nx + 2*HALO, ny + 2*HALO)``
for a logical ``(nx, ny)`` field). Kernels read neighbours through
:func:`sh` (static slices — XLA-friendly, no gather) and return *unpadded*
``(nx, ny)`` outputs. Who fills the ghost frame depends on the execution
mode and is invisible to the kernel:

- single-device global mode: :func:`pad` (zeros, or wrap for periodic
  basins) — the frame lies outside the global domain and the 2-cell
  land frame guarantees it never influences a wet point;
- sharded SPMD mode: parallel/halo.py fills it from neighbour shards with
  ``jax.lax.ppermute`` shifts over the device mesh.

This realizes the reference's per-block ghost arrays (2 ghost cells,
core/decomposition.f90:496-503) and its kernel/sync split
(core/kernel_interface.f90) in functional form: a kernel's *stencil-read*
arguments are exactly the fields the reference lists in its ``envoke_*_sync``
closures (interface/shallow_water/sw_interface.f90).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HALO = 2


def pad(f: jax.Array, periodic_x: bool = False, periodic_y: bool = False,
        h: int = HALO) -> jax.Array:
    """Pad a logical (nx, ny) field with an h-cell ghost frame.

    Non-periodic edges get zeros (matching the reference's zero-initialized
    block ghost frames, core/data_types.f90:517-558); periodic edges wrap.
    """
    if periodic_x or periodic_y:
        mode_x = "wrap" if periodic_x else "constant"
        mode_y = "wrap" if periodic_y else "constant"
        f = jnp.pad(f, ((h, h), (0, 0)), mode=mode_x)
        f = jnp.pad(f, ((0, 0), (h, h)), mode=mode_y)
        return f
    return jnp.pad(f, h)


def sh(fp: jax.Array, dm: int, dn: int, h: int = HALO) -> jax.Array:
    """Shifted view: result[m, n] = f[m + dm, n + dn].

    ``fp`` is padded; the result is the unpadded (nx, ny) shape. ``dm``/``dn``
    must satisfy ``|dm|, |dn| <= h``.
    """
    nx = fp.shape[0] - 2 * h
    ny = fp.shape[1] - 2 * h
    return jax.lax.slice(fp, (h + dm, h + dn), (h + dm + nx, h + dn + ny))


def C(fp: jax.Array, h: int = HALO) -> jax.Array:
    """Center view (the unpadded field)."""
    return sh(fp, 0, 0, h)


def wet(mask_c: jax.Array) -> jax.Array:
    """Boolean wet-point predicate from a real-valued Arakawa mask.

    The reference tests ``mask > 0.5`` everywhere (e.g. vel_ssh.f90:97).
    ``mask_c`` must already be the center view.
    """
    return mask_c > 0.5
