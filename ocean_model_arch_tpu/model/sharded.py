"""SPMD sharded model step over a 2D device mesh.

The TPU-native realization of the reference's MPI domain decomposition
(core/decomposition.f90) + halo sync (shared/mpp/sync.f90): the global
(nx, ny) state is sharded P("x", "y") over a jax Mesh; the *same* kernel
composition as the single-device path (model/step.py) runs per shard under
jax.shard_map with a ShardHalo provider whose ppermute edge exchanges
replace MPI isend/irecv. XLA overlaps these collectives with independent
kernel compute — realizing the comm/compute overlap the reference designed
but left unimplemented (_MPP_HYBRID_BLOCK_MODE_, README.md:56-57).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig
from ..core.grid import Grid
from ..core.state import SWState
from ..ops import sw_kernels as swk
from ..parallel.domain import pad_grid, pad_state
from ..parallel.halo import ShardHalo
from ..parallel.mesh import shard_tree, tree_specs
from .step import sw_step, tracer_step


def prepare(grid: Grid, state: SWState, mesh: Mesh):
    """Pad grid+state to mesh-divisible extents and place the shards."""
    px, py = mesh.devices.shape
    grid_p = pad_grid(grid, px, py)
    state_p = pad_state(state, px, py)
    return shard_tree(grid_p, mesh), shard_tree(state_p, mesh)


def make_sharded_step(grid_p: Grid, cfg: ModelConfig, mesh: Mesh,
                      n_inner: int = 1) -> Callable:
    """Jitted SPMD step: ``fn(state, tau) -> (state, ok)``, advancing
    ``n_inner`` steps per call (lax.scan inside the shard_map so the whole
    multi-step trajectory compiles into one XLA program with fused
    collectives).

    ``grid_p`` must already be mesh-divisible (see :func:`prepare`).
    """
    px, py = mesh.devices.shape
    hp = ShardHalo(px, py, grid_p.periodic_x, grid_p.periodic_y)

    gspecs = tree_specs(grid_p)

    def local_fn(state: SWState, grid: Grid, tau):
        # hoist static-field halo exchanges out of the time loop: the
        # grid leaves are scan-body constants, so pre-exchanging them
        # here leaves only the prognostic exchanges inside the scan
        hp.cache_statics(grid, grid.lu.shape)

        def one(st, _):
            st = sw_step(st, grid, cfg, tau, hp)
            st = tracer_step(st, grid, cfg, tau, hp)
            ok_l = swk.check_ssh_ok(hp.zp(grid.lu), hp.zp(st.ssh))
            return st, ok_l

        if n_inner == 1:
            state, ok_l = one(state, None)
        else:
            state, oks = lax.scan(one, state, None, length=n_inner)
            ok_l = jnp.all(oks)
        # global all-reduce of the stability flag (the reference's
        # check_error allreduce, shared/errors.f90:16-27)
        ok = lax.psum(ok_l.astype(jnp.int32), ("x", "y")) == px * py
        return state, ok

    @jax.jit
    def stepped_impl(state, grid_arg, tau):
        specs = tree_specs(state)
        fn = jax.shard_map(
            lambda st, g, t: local_fn(st, g, t),
            mesh=mesh,
            in_specs=(specs, gspecs, P()),
            out_specs=(specs, P()),
        )
        return fn(state, grid_arg, tau)

    def stepped(state, tau):
        # the grid rides as a jit ARGUMENT, not a closure: closing over
        # arrays that span non-addressable devices is rejected in
        # multi-process execution
        return stepped_impl(state, grid_p, tau)

    return stepped
