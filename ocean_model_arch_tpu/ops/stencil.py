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
    """Pad the spatial (last two) axes with an h-cell ghost frame; leading
    axes (e.g. the nlev dimension of 3D fields) pass through untouched.

    Non-periodic edges get zeros (matching the reference's zero-initialized
    block ghost frames, core/data_types.f90:517-558); periodic edges wrap.
    """
    lead = [(0, 0)] * (f.ndim - 2)
    mode_x = "wrap" if periodic_x else "constant"
    mode_y = "wrap" if periodic_y else "constant"
    if mode_x == mode_y:
        return jnp.pad(f, lead + [(h, h), (h, h)], mode=mode_x)
    f = jnp.pad(f, lead + [(h, h), (0, 0)], mode=mode_x)
    return jnp.pad(f, lead + [(0, 0), (h, h)], mode=mode_y)


def sh(fp: jax.Array, dm: int, dn: int, h: int = HALO) -> jax.Array:
    """Shifted view: result[..., m, n] = f[..., m + dm, n + dn].

    ``fp`` is padded on its last two axes; the result drops the padding.
    ``dm``/``dn`` must satisfy ``|dm|, |dn| <= h``.
    """
    nx = fp.shape[-2] - 2 * h
    ny = fp.shape[-1] - 2 * h
    start = [0] * (fp.ndim - 2) + [h + dm, h + dn]
    limit = list(fp.shape[:-2]) + [h + dm + nx, h + dn + ny]
    return jax.lax.slice(fp, start, limit)


def C(fp: jax.Array, h: int = HALO) -> jax.Array:
    """Center view (the unpadded field)."""
    return sh(fp, 0, 0, h)


def wet(mask_c: jax.Array) -> jax.Array:
    """Boolean wet-point predicate from a real-valued Arakawa mask.

    The reference tests ``mask > 0.5`` everywhere (e.g. vel_ssh.f90:97).
    ``mask_c`` must already be the center view.
    """
    return mask_c > 0.5
