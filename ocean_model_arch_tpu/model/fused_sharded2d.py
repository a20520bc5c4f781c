"""Fused Pallas step over a full 2D device mesh.

Generalizes model/fused_sharded.py (x-only) to P("x", "y") sharding: each
exchange the prognostic shards swap 8-row x-margins and 8-lane y-margins
with their mesh neighbours in two ppermute passes (the y-pass runs on the
x-margined array, so corner margins arrive from the diagonal neighbour —
the same composition as parallel/halo.py), then every shard runs the
whole-step kernel on its (xl+16, yl+16) margined block.

Margin-width safety: the kernel's y-shifts are lane rolls; wrap-around
garbage creeps inward by the cumulative stencil reach (<= 4 cells) per
step, so the 8-cell margins cover TWO chained model steps per exchange
(``steps_per_call=2``, the kernel's output-halo chaining) — halving the
per-step collective count. The same argument sizes the x Element-window
margin.

Full config envelope (matching the reference's GPU layer covering every
configuration, gpu/interface/sw_interface_gpu.f90):

- fast mode (static mask/reciprocal planes) whenever metrics are
  x-uniform — the same planes as the single-device driver, built globally
  and sliced per shard so seams are exact;
- 2D metric planes (bipolar / curvilinear grids,
  grid_parameters.f90:183): per-shard (16, xl+2M, yl+2M) blocks;
- periodic basins: the margin exchange adds the wrap ppermute pair (or a
  local wrap concatenate on 1-shard axes) and the static margins are
  wrap-padded; requires the periodic axis to be exactly mesh-divisible
  (no padding between the seam neighbours).
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
                 interpret: bool = False, mu_const: float = 0.0,
                 static_rslu: bool = True, steps_per_call: int = 1):
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
        self.periodic_x = bool(grid.periodic_x)
        self.periodic_y = bool(grid.periodic_y)
        if self.periodic_x and xl * px != grid.nx:
            raise ValueError(
                f"periodic x needs nx divisible by px*tx "
                f"(nx={grid.nx}, px={px}, tx={tx})")
        if self.periodic_y and yl * py != grid.ny:
            raise ValueError(
                f"periodic y needs ny divisible by py "
                f"(ny={grid.ny}, py={py})")
        self.xl, self.yl = xl, yl
        self.Xg, self.Yg = xl * px, yl * py
        self.lay = fsk.FusedLayout(nx=grid.nx, ny=grid.ny, X=xl,
                                   Xs=xl + 2 * M, Ys=yl + 2 * M, tx=tx)

        # ---- global -> per-shard margined statics -----------------------
        def pad2(g):
            """(Xg, Yg) -> (Xg+2M, Yg+2M) margins: wrapped on periodic
            axes (seam adjacency), land zeros elsewhere."""
            g = np.pad(g, ((M, M), (0, 0)),
                       mode="wrap" if self.periodic_x else "constant")
            return np.pad(g, ((0, 0), (M, M)),
                          mode="wrap" if self.periodic_y else "constant")

        def shard4(gp, lead=0):
            """Margined global (..., Xg+2M, Yg+2M) -> per-shard blocks
            (px, py, ..., xl+2M, yl+2M)."""
            out = np.zeros((px, py) + gp.shape[:lead]
                           + (xl + 2 * M, yl + 2 * M), np.float32)
            for i in range(px):
                for j in range(py):
                    out[i, j] = gp[..., i * xl: i * xl + xl + 2 * M,
                                   j * yl: j * yl + yl + 2 * M]
            return out

        def glob(field2d):
            g = np.zeros((self.Xg, self.Yg), np.float32)
            g[:grid.nx, :grid.ny] = np.asarray(field2d)
            return g

        lu_gp = pad2(glob(grid.lu))
        hr_gp = pad2(glob(grid.hhq_rest))
        self.lu_shards = jnp.asarray(shard4(lu_gp))
        self.hr_shards = jnp.asarray(shard4(hr_gp))

        # ---- metrics: y-profiles (x-uniform) or full 2D planes ----------
        try:
            gprof = self._global_profiles(grid)       # (N_PROF, ny)
            self.metrics_2d = False
        except ValueError:
            self.metrics_2d = True
        if self.metrics_2d:
            met_g = self._global_planes(grid, pad2)   # (16, Xg+2M, Yg+2M)
            self.met_shards = jnp.asarray(shard4(met_g, lead=1))
            met_spec = P("x", "y", None, None, None)
            prof_padded = None
        else:
            gprof = np.pad(gprof, ((0, 0), (0, self.Yg - grid.ny)),
                           mode="edge")
            prof_padded = np.pad(gprof, ((0, 0), (M, M)),
                                 mode="wrap" if self.periodic_y
                                 else "edge")      # (N_PROF, Yg+2M)
            prof_sh = np.zeros((py, fsk.N_PROF, yl + 2 * M), np.float32)
            for j in range(py):
                prof_sh[j] = prof_padded[:, j * yl: j * yl + yl + 2 * M]
            self.met_shards = jnp.asarray(prof_sh)
            met_spec = P("y", None, None)
        self._met_spec = met_spec

        self.n_tracers = (cfg.sw.tracer_num if cfg.sw.use_tracers > 0
                          else 0)
        self.mu_const = float(mu_const or 0.0)

        # ---- static mask/reciprocal planes (fast mode) -------------------
        self.static_rslu = bool(static_rslu)
        if self.static_rslu:
            names = fsk.plane_names(cfg.sw.full_free_surface,
                                    cfg.sw.ksw_lat, self.mu_const,
                                    self.metrics_2d)
            if self.metrics_2d:
                dxdy = met_g[0] * met_g[1]
                recips = None
            else:
                dxdy = (prof_padded[0] * prof_padded[1])[None, :]
                recips = (prof_padded[10:11], prof_padded[11:12],
                          (prof_padded[14] * prof_padded[15])[None, :])
            planes_g = fsk.static_planes(lu_gp, hr_gp, dxdy, names,
                                         interp_recips=recips)
            self.plane_shards = jnp.asarray(shard4(planes_g, lead=1))
        else:
            self.plane_shards = None

        self.steps_per_call = int(steps_per_call)
        self.step_raw = fsk.build_fused_sw_step(
            self.lay, None, None, None, float(tau), cfg.sw.time_smooth,
            cfg.sw.full_free_surface, cfg.sw.trans_terms, cfg.sw.ksw_lat,
            mu_const=self.mu_const, n_tracers=self.n_tracers,
            interpret=interpret, metrics_2d=self.metrics_2d,
            rslu_planes=(True if self.static_rslu else None),
            steps_per_call=self.steps_per_call)

    @staticmethod
    def _global_profiles(grid: Grid) -> np.ndarray:
        """(N_PROF, ny) metric + reciprocal latitude profiles (the
        unsharded builder's layout, without the YPAD embedding)."""
        lay0 = fsk.FusedLayout(grid.nx, grid.ny, 0, 0,
                               grid.ny + 2 * fsk.YPAD, 0)
        rows = fsk.metrics_profile_from_grid(grid, lay0)
        return rows[:, fsk.YPAD:fsk.YPAD + grid.ny]

    def _global_planes(self, grid: Grid, pad2) -> np.ndarray:
        """(16, Xg+2M, Yg+2M) full metric planes for the 2D-metrics
        sharded path; physical edges replicated (or wrapped on periodic
        axes) so reciprocals stay finite."""
        names = ["dx", "dy", "dxt", "dyt", "dxh", "dyh", "dxb", "dyb",
                 "rlh_s"]
        planes = np.zeros((16, self.Xg + 2 * M, self.Yg + 2 * M),
                          np.float32)
        for k, name in enumerate(names):
            f = np.asarray(getattr(grid, name), np.float32)
            # edge-extend over the mesh-divisible pad, then margin
            g = np.pad(f, ((0, self.Xg - grid.nx),
                           (0, self.Yg - grid.ny)), mode="edge")
            gp = np.pad(g, ((M, M), (0, 0)),
                        mode="wrap" if self.periodic_x else "edge")
            planes[k] = np.pad(gp, ((0, 0), (M, M)),
                               mode="wrap" if self.periodic_y else "edge")
        with np.errstate(divide="ignore"):
            planes[9] = np.float32(1.0) / (planes[0] * planes[1])
            for k, src in ((10, 2), (11, 3), (12, 4), (13, 5), (14, 6),
                           (15, 7)):
                planes[k] = np.float32(1.0) / planes[src]
        planes[9:16][~np.isfinite(planes[9:16])] = 0.0
        return planes

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
        spc = self.steps_per_call
        if n_inner % spc:
            raise ValueError(f"n_inner={n_inner} not a multiple of "
                             f"steps_per_call={spc}")
        fwd_x = [(i, i + 1) for i in range(px - 1)]
        bwd_x = [(i + 1, i) for i in range(px - 1)]
        fwd_y = [(i, i + 1) for i in range(py - 1)]
        bwd_y = [(i + 1, i) for i in range(py - 1)]
        if self.periodic_x and px > 1:
            fwd_x.append((px - 1, 0))
            bwd_x.append((0, px - 1))
        if self.periodic_y and py > 1:
            fwd_y.append((py - 1, 0))
            bwd_y.append((0, py - 1))

        def exchange(f):
            """(xl, yl) -> (xl+2M, yl+2M); y-pass on the x-margined array
            carries the corners. 1-shard periodic axes wrap locally."""
            if px == 1:
                if self.periodic_x:
                    fx = jnp.concatenate([f[-M:], f, f[:M]], axis=0)
                else:
                    fx = jnp.pad(f, ((M, M), (0, 0)))
            else:
                low = lax.ppermute(f[-M:], "x", fwd_x)
                high = lax.ppermute(f[:M], "x", bwd_x)
                fx = jnp.concatenate([low, f, high], axis=0)
            if py == 1:
                if self.periodic_y:
                    return jnp.concatenate([fx[:, -M:], fx, fx[:, :M]],
                                           axis=1)
                return jnp.pad(fx, ((0, 0), (M, M)))
            low = lax.ppermute(fx[:, -M:], "y", fwd_y)
            high = lax.ppermute(fx[:, :M], "y", bwd_y)
            return jnp.concatenate([low, fx, high], axis=1)

        def local_fn(lu_b, hr_b, met_b, plane_b, carry):
            lu_l = lu_b[0, 0]
            hr_l = hr_b[0, 0]
            met_l = met_b[0, 0] if self.metrics_2d else met_b[0]
            extra = ()
            if self.static_rslu:
                extra = (plane_b[0, 0],)

            def one(c, _):
                margined = tuple(exchange(f) for f in c)
                outs = self.step_raw(lu_l, hr_l, met_l, *extra, *margined)
                return tuple(o[M:-M, M:-M] for o in outs), None

            carry, _ = lax.scan(one, tuple(carry), None,
                                length=n_inner // spc)
            okl = swk.check_ssh_ok(jnp.pad(lu_l[M:-M, M:-M], 2),
                                   jnp.pad(carry[0], 2))
            ok = lax.psum(okl.astype(jnp.int32), ("x", "y")) == px * py
            return carry, ok

        nf = 6 + 2 * self.n_tracers
        plane_spec = (P("x", "y", None, None, None)
                      if self.static_rslu else P())
        planes = (self.plane_shards if self.static_rslu
                  else jnp.zeros((), jnp.float32))
        sharded = jax.shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(P("x", "y", None, None), P("x", "y", None, None),
                      self._met_spec, plane_spec,
                      tuple(P("x", "y") for _ in range(nf))),
            out_specs=(tuple(P("x", "y") for _ in range(nf)), P()),
            check_vma=False,
        )

        @jax.jit
        def runner(carry):
            return sharded(self.lu_shards, self.hr_shards,
                           self.met_shards, planes, tuple(carry))

        return runner
