"""Halo exchange over the device mesh — the communication backend.

The TPU-native replacement for the reference's hand-packed MPI halo sync
engine (shared/mpp/sync.f90 + syncborder_block2D_gen_all.fi): instead of
pack -> isend/irecv -> waitall -> unpack over 8 directions, each exchange
is two passes of jax.lax.ppermute edge-strip shifts (x then y). The second
pass operates on the already-x-padded array, so corner halos propagate
from the diagonal neighbour exactly like the reference's explicit corner
strips (dirs 5-8, _gen_all.fi:49-52) — without extra messages.

Non-periodic physical edges receive zeros (ppermute's semantics for
devices with no sender), matching the reference's zero ghost frames;
periodic axes add the wrap pair.

Used inside jax.shard_map: class ShardHalo is a drop-in halo provider for
model/step.py's composer (same interface as GlobalHalo).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.stencil import HALO


def _exchange_axis(f, axis: int, axis_name: str, n: int, periodic: bool,
                   h: int = HALO):
    """Pad ``f`` along spatial ``axis`` (negative = from the end, so 3D
    nlev fields work) with h cells from the mesh neighbours."""
    axis = axis % f.ndim
    if n == 1:
        # single shard along this axis: the halo is the physical boundary
        # (zeros) or the wrap-around of the local array
        pads = [(0, 0)] * f.ndim
        pads[axis] = (h, h)
        return jnp.pad(f, pads, mode="wrap" if periodic else "constant")

    size = f.shape[axis]
    last = lax.slice_in_dim(f, size - h, size, axis=axis)
    first = lax.slice_in_dim(f, 0, h, axis=axis)

    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    if periodic:
        fwd.append((n - 1, 0))
        bwd.append((0, n - 1))

    # device i's low-side halo = device (i-1)'s last strip  -> shift forward
    low = lax.ppermute(last, axis_name, fwd)
    # device i's high-side halo = device (i+1)'s first strip -> shift back
    high = lax.ppermute(first, axis_name, bwd)
    return jnp.concatenate([low, f, high], axis=axis)


class ShardHalo:
    """Halo provider for per-shard kernels inside shard_map.

    ``ex``: two-pass neighbour exchange (valid halos incl. corners).
    ``zp``: local zero-pad (for pointwise-read args — no communication).
    """

    def __init__(self, px: int, py: int,
                 periodic_x: bool = False, periodic_y: bool = False,
                 h: int = HALO, axis_x: str = "x", axis_y: str = "y"):
        self.px = px
        self.py = py
        self.periodic_x = periodic_x
        self.periodic_y = periodic_y
        self.h = h
        self.axis_x = axis_x
        self.axis_y = axis_y
        # identity-keyed exchange memo: ex() is a pure function of the
        # array value, so two calls on the SAME object within one trace
        # are identical — memoizing dedupes repeated per-step exchanges
        # (the composer calls ex(s.ubrtr) etc. several times per step)
        # the way the reference's sync lists exchange each field once
        # (sw_interface.f90:330-381). Entries hold the key object, so a
        # recycled id can never false-hit (identity check below).
        self._memo = {}

    def cache_statics(self, tree, spatial_shape) -> None:
        """Pre-exchange every spatial array leaf of ``tree`` (trailing
        dims == ``spatial_shape``, the local (lx, ly) extents) and memoize
        it. Call OUTSIDE the time loop (before lax.scan): later ``ex(f)``
        calls on the same objects return the precomputed margined arrays,
        hoisting all static-field collectives out of the per-step scan
        body. Also resets the memo, dropping entries from any previous
        trace."""
        self._memo = {}
        spatial = tuple(spatial_shape)
        for leaf in jax.tree_util.tree_leaves(tree):
            if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                    and tuple(leaf.shape[-2:]) == spatial):
                self._memo[id(leaf)] = (leaf, self._ex(leaf))

    def ex(self, f):
        hit = self._memo.get(id(f))
        if hit is not None and hit[0] is f:
            return hit[1]
        out = self._ex(f)
        self._memo[id(f)] = (f, out)
        return out

    def ex_batch(self, fields) -> None:
        """Exchange several same-shape 2D fields with ONE stacked strip
        collective per direction instead of one per field — the batched
        form of the reference's per-kernel sync LISTS (each kernel's
        stencil arguments sync together, sw_interface.f90:330-381).
        Results are memoized, so subsequent ``ex(f)`` calls on the same
        objects are free; unmemoized singles stay correct either way.
        Cuts the per-step collective count ~3x on the jnp-sharded path
        (latency-bound thin strips)."""
        fields = [f for f in fields
                  if not (self._memo.get(id(f))
                          and self._memo[id(f)][0] is f)]
        if not fields:
            return
        if len(fields) == 1:
            self.ex(fields[0])
            return
        out = self._ex(jnp.stack(fields))
        for i, f in enumerate(fields):
            self._memo[id(f)] = (f, out[i])

    def _ex(self, f):
        f = _exchange_axis(f, -2, self.axis_x, self.px, self.periodic_x,
                           self.h)
        f = _exchange_axis(f, -1, self.axis_y, self.py, self.periodic_y,
                           self.h)
        return f

    def zp(self, f):
        lead = [(0, 0)] * (f.ndim - 2)
        return jnp.pad(f, lead + [(self.h, self.h), (self.h, self.h)])


def halo_self_test(mesh, nx: int, ny: int,
                   periodic_x: bool = False, periodic_y: bool = False,
                   h: int = HALO) -> None:
    """Runtime halo-exchange verification — the reference's sync_test
    (shared/mpp/syncborder_block2D_gen_test.fi): fill the global field
    with the analytic f(i, j) = i*j (1-based), exchange, and assert every
    halo cell of every shard equals the analytic value (zero / wrapped
    outside the domain). Raises AssertionError on mismatch.

    Call it at startup with the production mesh, like the reference's
    commented-in `call sync_test(domain, ocean_data%ssh)`
    (init_data.f90:41-44).
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    px, py = mesh.devices.shape
    if nx % px or ny % py:
        raise ValueError("extents must divide the mesh for the self-test")
    i = np.arange(1, nx + 1)[:, None].astype(np.float64)
    j = np.arange(1, ny + 1)[None, :].astype(np.float64)
    f = jax.device_put(i * j, NamedSharding(mesh, P("x", "y")))

    hp = ShardHalo(px, py, periodic_x, periodic_y, h=h)
    ex = jax.jit(jax.shard_map(hp.ex, mesh=mesh, in_specs=P("x", "y"),
                               out_specs=P("x", "y"), check_vma=False))
    res = ex(f)
    if jax.process_count() > 1:
        # the mesh spans processes: materialize the global result with
        # a collective fetch (np.asarray on non-addressable shards
        # raises)
        from jax.experimental import multihost_utils
        out = np.asarray(multihost_utils.process_allgather(res,
                                                           tiled=True))
    else:
        out = np.asarray(res)
    lx, ly = nx // px, ny // py
    blocks = out.reshape(px, lx + 2 * h, py, ly + 2 * h)
    gi = np.arange(-h, lx + h)
    gj = np.arange(-h, ly + h)
    for bi in range(px):
        for bj in range(py):
            gm = bi * lx + gi
            gn = bj * ly + gj
            if periodic_x:
                gm = gm % nx
            if periodic_y:
                gn = gn % ny
            want = np.where(
                (gm[:, None] >= 0) & (gm[:, None] < nx)
                & (gn[None, :] >= 0) & (gn[None, :] < ny),
                (gm[:, None] + 1.0) * (gn[None, :] + 1.0), 0.0)
            got = blocks[bi, :, bj, :]
            if not np.array_equal(got, want):
                bad = np.argwhere(got != want)[0]
                raise AssertionError(
                    f"halo self-test failed at shard ({bi},{bj}) "
                    f"cell {tuple(bad)}: got {got[tuple(bad)]}, "
                    f"want {want[tuple(bad)]}")
