"""Fused Pallas step over a full 2D device mesh.

Generalizes model/fused_sharded.py (x-only) to P("x", "y") sharding: each
step the prognostic shards exchange 8-row x-margins and 8-lane y-margins
with their mesh neighbours in two ppermute passes (the y-pass runs on the
x-margined array, so corner margins arrive from the diagonal neighbour —
the same composition as parallel/halo.py), then every shard runs the
whole-step kernel on its (xl+16, yl+16) margined block.

Margin-width safety: the kernel's y-shifts are lane rolls; wrap-around
garbage creeps inward by the cumulative stencil reach (<= 4 cells) per
step, so the 8-cell margins keep every domain cell clean — the same
argument that sizes the x Element-window margin.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..core.grid import Grid
from ..core.state import SWState
from ..ops import sw_kernels as swk
from ..ops.pallas import fused_step as fsk

M = fsk.MARGIN   # margin width in both axes


class FusedSharded2DModel:
    """Fused model sharded over a px * py mesh."""

    def __init__(self, grid: Grid, cfg: ModelConfig, tau: float,
                 px: int, py: int, tx: int = 64, devices=None,
                 interpret: bool = False, mu_const: float = 0.0):
        if grid.periodic_x or grid.periodic_y:
            raise ValueError("fused sharded path: periodic unsupported")
        self.grid = grid
        self.cfg = cfg
        self.px, self.py = px, py
        if devices is None:
            devices = jax.devices()[:px * py]
        self.mesh = Mesh(np.array(devices).reshape(px, py), ("x", "y"))

        xl = -(-grid.nx // (px * tx)) * tx
        yl = -(-grid.ny // py)
        if xl < M or yl < M:
            raise ValueError(
                f"shards must be at least {M} cells wide for the margin "
                f"exchange (got {xl}x{yl}); use a smaller mesh")
        self.xl, self.yl = xl, yl
        self.Xg, self.Yg = xl * px, yl * py
        self.lay = fsk.FusedLayout(nx=grid.nx, ny=grid.ny, X=xl,
                                   Xs=xl + 2 * M, Ys=yl + 2 * M, tx=tx)

        # global metric y-profiles, margined per y-shard:
        # (py, N_PROF, yl+2M)
        gprof = self._global_profiles(grid)           # (N_PROF, ny)
        # extend over the padded global extent Yg, then add margins
        gprof = np.pad(gprof, ((0, 0), (0, self.Yg - grid.ny)),
                       mode="edge")
        prof_sh = np.zeros((py, fsk.N_PROF, yl + 2 * M), np.float32)
        padded = np.pad(gprof, ((0, 0), (M, M)), mode="edge")
        for j in range(py):
            prof_sh[j] = padded[:, j * yl: j * yl + yl + 2 * M]
        self.prof_shards = jnp.asarray(prof_sh)

        # per-shard margined statics: (px, py, xl+2M, yl+2M)
        def margined(field2d):
            g = np.zeros((self.Xg, self.Yg), np.float32)
            g[:grid.nx, :grid.ny] = np.asarray(field2d)
            gp = np.pad(g, M)
            out = np.zeros((px, py, xl + 2 * M, yl + 2 * M), np.float32)
            for i in range(px):
                for j in range(py):
                    out[i, j] = gp[i * xl: i * xl + xl + 2 * M,
                                   j * yl: j * yl + yl + 2 * M]
            return out

        self.lu_shards = jnp.asarray(margined(grid.lu))
        self.hr_shards = jnp.asarray(margined(grid.hhq_rest))

        self.n_tracers = (cfg.sw.tracer_num if cfg.sw.use_tracers > 0
                          else 0)
        self.mu_const = float(mu_const or 0.0)
        self.step_raw = fsk.build_fused_sw_step(
            self.lay, None, None, None, float(tau), cfg.sw.time_smooth,
            cfg.sw.full_free_surface, cfg.sw.trans_terms, cfg.sw.ksw_lat,
            mu_const=self.mu_const, n_tracers=self.n_tracers,
            interpret=interpret)

    @staticmethod
    def _global_profiles(grid: Grid) -> np.ndarray:
        """(N_PROF, ny) metric + reciprocal latitude profiles (the
        unsharded builder's layout, without the YPAD embedding)."""
        lay0 = fsk.FusedLayout(grid.nx, grid.ny, 0, 0,
                               grid.ny + 2 * fsk.YPAD, 0)
        rows = fsk.metrics_profile_from_grid(grid, lay0)
        return rows[:, fsk.YPAD:fsk.YPAD + grid.ny]

    # ------------------------------------------------------------------
    def pack(self, state: SWState):
        def embed(a):
            g = jnp.zeros((self.Xg, self.Yg), jnp.float32)
            g = g.at[:self.grid.nx, :self.grid.ny].set(
                jnp.asarray(a, jnp.float32))
            return jax.device_put(g, NamedSharding(self.mesh, P("x", "y")))
        fields = [state.ssh, state.sshp, state.ubrtr, state.ubrtrp,
                  state.vbrtr, state.vbrtrp]
        for t in range(self.n_tracers):
            fields += [state.ff[t], state.ffp[t]]
        return tuple(embed(a) for a in fields)

    def extract(self, carry):
        return tuple(a[:self.grid.nx, :self.grid.ny] for a in carry)

    # ------------------------------------------------------------------
    def make_runner(self, n_inner: int):
        px, py = self.px, self.py
        fwd_x = [(i, i + 1) for i in range(px - 1)]
        bwd_x = [(i + 1, i) for i in range(px - 1)]
        fwd_y = [(i, i + 1) for i in range(py - 1)]
        bwd_y = [(i + 1, i) for i in range(py - 1)]

        def exchange(f):
            """(xl, yl) -> (xl+2M, yl+2M); y-pass on the x-margined array
            carries the corners."""
            if px == 1:
                fx = jnp.pad(f, ((M, M), (0, 0)))
            else:
                low = lax.ppermute(f[-M:], "x", fwd_x)
                high = lax.ppermute(f[:M], "x", bwd_x)
                fx = jnp.concatenate([low, f, high], axis=0)
            if py == 1:
                return jnp.pad(fx, ((0, 0), (M, M)))
            low = lax.ppermute(fx[:, -M:], "y", fwd_y)
            high = lax.ppermute(fx[:, :M], "y", bwd_y)
            return jnp.concatenate([low, fx, high], axis=1)

        def local_fn(lu_b, hr_b, prof_b, carry):
            lu_l = lu_b[0, 0]
            hr_l = hr_b[0, 0]
            met_l = prof_b[0]

            def one(c, _):
                margined = tuple(exchange(f) for f in c)
                outs = self.step_raw(lu_l, hr_l, met_l, *margined)
                return tuple(o[M:-M, M:-M] for o in outs), None

            carry, _ = lax.scan(one, tuple(carry), None, length=n_inner)
            okl = swk.check_ssh_ok(jnp.pad(lu_l[M:-M, M:-M], 2),
                                   jnp.pad(carry[0], 2))
            ok = lax.psum(okl.astype(jnp.int32), ("x", "y")) == px * py
            return carry, ok

        nf = 6 + 2 * self.n_tracers
        sharded = jax.shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(P("x", "y", None, None), P("x", "y", None, None),
                      P("y", None, None),
                      tuple(P("x", "y") for _ in range(nf))),
            out_specs=(tuple(P("x", "y") for _ in range(nf)), P()),
            check_vma=False,
        )

        @jax.jit
        def runner(carry):
            return sharded(self.lu_shards, self.hr_shards,
                           self.prof_shards, tuple(carry))

        return runner
