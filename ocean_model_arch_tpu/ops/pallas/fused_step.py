"""Fused whole-step Pallas TPU kernel for the shallow-water core.

This is the TPU-native analog of the reference's CUDA Fortran kernel layer
(gpu/kernel/*, gpu/interface/*) — but instead of mirroring the 11 separate
kernels, it exploits two structural facts the reference cannot:

1. **Depths are recomputable.** Because expl_shallow_water ends every step
   with hh_init (shallow_water.f90:82-87), every depth field entering a
   step is a pure function of (ssh, sshp, hhq_rest). The fused kernel
   recomputes them in VMEM instead of streaming 12 depth arrays through
   HBM — trading free VPU FLOPs for scarce HBM bandwidth. Likewise the
   staggered masks are recomputed from ``lu``, and hh_update's new-level
   depths coincide with the current-level ones (hqn = h_r + ssh = hq when
   full_free_surface=1), so one interpolation family serves both.

2. **The whole step fuses — and chains.** The per-step stencil reach of
   the full update_ssh -> hh_update -> vort -> uv_trans -> stress ->
   uv_diff2 -> update_uv -> next_step -> [tracer] chain is <= 4 cells,
   and the output-stage masked selects restore exact zeros on every land
   cell, so a tile with an 8-cell halo runs TWO whole model steps per
   invocation (``steps_per_call=2``): step A computes the full update at
   halo 4, step B consumes it down to halo 0. The intermediate state
   never touches HBM, halving the streamed passes per model step.

Layout: arrays are (Xs, Ys) float32 where Xs = margin + X + margin
(margin = 8 rows of land so halo windows never leave the array — Mosaic
element windows reject low padding) and Ys = ny + 4 extra land columns
(y-shifts are lane rolls; wrapped values land on land cells only).
Tiles are x-strips: Element windows (TX + 16, Ys) overlapping by the
margin, outputs (TX, Ys) disjoint. Metric fields must be x-uniform
(regular x spacing — true for every reference config with xgr_type=0);
they ride as (16, Ys) latitude profiles broadcast across rows.

Restrictions vs the jnp path (which remains the general fallback):
non-periodic boundaries, spatially-constant mu, r_diss = 0 (the
reference never writes it, core/data_types zero-init). x-varying
(bipolar/curvilinear) metrics run through the fast-2D mode (round 5):
the same fast restructurings with pointwise (Xs, Ys) metric planes,
streaming only the rows the config consumes (fast2d_met_rows).

Round-5 arithmetic reductions (fast mode, default ON in the drivers):

- ``elide_sel``: the four u/up/v/vp filter selects (plus the tracer
  pair) are dropped — un1/vn1 already select 0 at land and pack masks
  the carriers, so land stays exactly 0 and the selects were identity.
- ``q4``: the advection 1/4 interpolation factor folds into the
  rslu_u/rslu_v static planes; every compensating constant (-4g,
  -8tau, tau/2, 0.1875 thresholds, tracer -2.0/4mu) is an exact
  exponent shift, so the F/G/K/L per-point 0.25 multiplies vanish.
- ``share_prev``: step B of a chained call rebuilds its prev-level
  depth interps from step A's (hu, hv, hup, hvp) through the leapfrog
  filter identity (aq is affine in ssh with land-zero coefficients and
  ts1 + 2*ts2 == 1), replacing two interps + two rolls + the aq fma
  with three elementwise ops.

All three are exact in real arithmetic; observed deviation vs the
unreduced kernel is ~1 ulp/step from XLA FMA-contraction re-fusing
(tests/test_fused.py::test_round5_*).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.constants import FREE_FALL_ACC

MARGIN = 8          # default x margin rows (2 steps x reach 4; 8-aligned)
# Default Mosaic vmem_limit for fast-mode compiled kernels (1D and
# 2D-metrics): the round-5 cap sweeps measured a broad FAST plateau at
# small caps and strictly worse times above it — the limit steers
# Mosaic's pipelining depth. x-uniform kernel: uncapped 17.7, 48MB
# 17.6, 40MB 18.3, 36/32MB 18.5, 24MB 18.5, 16MB 18.0 Gpts/s.
# Production-extent bipolar (fast2d): UNCAPPED CRASHES the remote
# compile service (HTTP 500); 100MB 9.4 -> 64MB 13.4 -> 48MB 16.3 ->
# 40MB 17.8 -> 32MB 17.5 Gpts/s — full parity with the x-uniform
# kernel. 36MB sits on both plateaus. (This reverses r4's "64MB cap
# costs 10%" on the pre-reduction kernel; re-sweep after major kernel
# or Mosaic changes.)
FAST_VMEM_CAP = 36 * 1024 * 1024


def margin_for(steps_per_call: int) -> int:
    """Margin width for a chaining depth: 4 cells of stencil reach per
    chained step, rounded up to the 8-row sublane alignment Element
    windows want (min 8)."""
    return max(8, -(-4 * int(steps_per_call) // 8) * 8)
# Kernel graph mode. 1 (default): every stage at the full window with
# roll-shifts — ONE shape for the whole graph. With the 128-aligned lane
# extent this is both the fastest on-chip (14.3 vs 13.0 Gpts/s at tx=64:
# Mosaic handles uniform rolls better than the sliced graph's shape
# diversity) and compiles ~10x faster. 0: per-stage halo shaving via
# x-slices (the historical mode; re-probe after major Mosaic updates via
# OCEAN_FUSED_UNIFORM_SHAPES=0).
UNIFORM_SHAPES = bool(int(
    __import__("os").environ.get("OCEAN_FUSED_UNIFORM_SHAPES", "1")))
# Narrow the chained-step frames: after each chained step, crop 4 rows
# per side (the consumed stencil reach) so step B runs on tx+2M-8 rows
# instead of tx+2M — recovering most of the uniform-shape graph's
# (tx+2M)/tx redundant row work for the later steps at the cost of one
# extra shape family (probe knob; r4 A/B).
NARROW_CHAIN = bool(int(
    __import__("os").environ.get("OCEAN_FUSED_NARROW_CHAIN", "0")))
YPAD = 2            # extra land columns each side in y
N_PROF = 24         # profile rows (9 metrics + 7 reciprocals + 6 derived)


class FusedLayout(NamedTuple):
    nx: int          # physical extents
    ny: int
    X: int           # domain rows (multiple of tile)
    Xs: int          # stored rows = X + 2*margin
    Ys: int          # stored cols = ny + 2*YPAD
    tx: int          # tile rows
    margin: int = MARGIN   # x margin rows (>= 4 * steps_per_call)
    ypad: int = YPAD       # physical y offset (the y land margin)


def make_layout(nx: int, ny: int, tx: int = 64,
                steps_per_call: int = 1) -> FusedLayout:
    """Ys is rounded up to a multiple of 128 (the lane width): lane rolls
    modulo a non-128-multiple force misaligned cross-vreg shuffles that
    cost ~6.6 ALU-equivalents each vs ~2.5 aligned (chip-measured,
    scripts/vpu_shift_probe.py) — the extra columns are dead land and
    cost only ~3% more streamed bytes."""
    X = -(-nx // tx) * tx
    Ys = -(-(ny + 2 * YPAD) // 128) * 128
    m = margin_for(steps_per_call)
    return FusedLayout(nx, ny, X, X + 2 * m, Ys, tx, m)


def make_layout_2d(nx: int, ny: int, tx: int = 64, ty: int = 512,
                   my: int = 128, steps_per_call: int = 1) -> FusedLayout:
    """Layout for the 2D-tiled (x, y) grid: lanes split into ceil(ny/ty)
    output tiles of ty lanes between my-lane land margins (my replaces
    YPAD as the physical y offset; (ty + 2*my) % 128 == 0 keeps windows
    lane-aligned)."""
    assert my % 128 == 0, my   # output lane offsets must be 128-aligned
    X = -(-nx // tx) * tx
    n_ty = -(-ny // ty)
    m = margin_for(steps_per_call)
    return FusedLayout(nx, ny, X, X + 2 * m, 2 * my + n_ty * ty, tx, m,
                       ypad=my)


def embed(lay: FusedLayout, a) -> jnp.ndarray:
    """Place an (nx, ny) field into the fused (Xs, Ys) layout (zeros
    elsewhere — land)."""
    out = jnp.zeros((lay.Xs, lay.Ys), jnp.float32)
    return out.at[lay.margin:lay.margin + lay.nx,
                  lay.ypad:lay.ypad + lay.ny].set(
                      jnp.asarray(a, jnp.float32))


def extract(lay: FusedLayout, a) -> jnp.ndarray:
    """Crop back to the physical (nx, ny) extents."""
    return a[lay.margin:lay.margin + lay.nx,
             lay.ypad:lay.ypad + lay.ny]


def _roll_y(a, dn: int, ys: int):
    """result[m, n] = a[m, n + dn] (lane roll; wrap hits land columns)."""
    if dn == 0:
        return a
    return pltpu.roll(a, (-dn) % ys, 1)


def plane_names(ffs: int, ksw: int, mu_const: float,
                metrics_2d: bool, hr_const: float | None = None,
                fast2d: bool = False) -> tuple:
    """Static-plane set for the fast kernel, config-dependent so that no
    unused plane is streamed per tile:

    - ``rslu_u/v/h``: reciprocal wet-neighbor counts of the depth
      interpolations (1/max(#wet,1)), premultiplied by the interp metric
      rows — they replace in-kernel select chains, and they ENCODE the
      staggered wet masks: wlcu <=> rslu_u == 0.5/dxt (both neighbours
      wet), wluu <=> rslu_h == 0.25/(dxb*dyb) (all four wet), so the
      kernel derives wlcu/wlcv/wluu by comparing against scaled profile
      rows instead of streaming three extra mask planes;
    - ``ludxdy`` = lu*dx*dy and ``hrludxdy`` = hhq_rest*lu*dx*dy — the
      weighted depth columns' static factors (ludxdy > 0.5 doubles as the
      wlu wet mask: metric products are >> 1 m^2 on every config);
    - ``wlu``: only the viscosity branch multiplies by it.

    With 2D metrics (bipolar grids) the default kernel consumes only the
    three reciprocal planes; the fast-2D mode (``fast2d=True``) uses the
    FULL fast set — the rslu planes carry the pointwise 2D metric recips
    exactly as the 1D planes carry latitude rows, so every fast-mode
    restructuring transfers verbatim.
    """
    if metrics_2d and not fast2d:
        return ("rslu_u", "rslu_v", "rslu_h")
    names = ["rslu_u", "rslu_v", "rslu_h", "ludxdy"]
    # spatially-constant bathymetry (the reference's shipped default:
    # flat 100 m, init_data.f90:113-114): hrludxdy == hr*ludxdy exactly,
    # so the plane folds into a scalar — one fewer streamed window
    if not (hr_const is not None and ffs):
        names.append("hrludxdy")
    if ksw and mu_const != 0.0:
        names.append("wlu")
    return tuple(names)


def _make_kernel(lay: FusedLayout, tau: float, time_smooth: float,
                 ffs: int, trans: int, ksw: int, mu_const: float,
                 n_tracers: int = 0, metrics_2d: bool = False,
                 static_rslu: bool = False, steps_per_call: int = 1,
                 has_lu: bool = True, has_hr: bool = True,
                 tile_guard: bool = False, guard_col: int = 0,
                 ys_win: int | None = None, n_ty: int = 1,
                 out_col_crop: int = 0, hr_const: float | None = None,
                 stacked: bool = False, rcp_div: bool = False,
                 resident_planes: bool = False, n_pl: int = 0,
                 elide_sel: bool = False, q4: bool = False,
                 share_prev: bool = False, fast2d: bool = False,
                 met_map: dict | None = None):
    M = lay.margin
    assert M >= 4 * steps_per_call, \
        f"margin {M} < 4*steps_per_call={4 * steps_per_call}"
    # window lane extent: full-array for x-strip tiling, ty + 2*my for
    # 2D (x, y) tiling — the roll modulo and broadcast width
    Ys = lay.Ys if ys_win is None else ys_win
    g = float(FREE_FALL_ACC)
    ts = float(time_smooth)
    visc = bool(ksw and mu_const != 0.0)
    # fast mode: static mask planes + extended profile rows let the hot
    # loop drop per-step mask recomputes, fold the 0.25 constants into
    # end-of-chain/profile scalings, and restructure vorticity around
    # precomputed metric-difference profiles (x-uniform metrics only)
    # fast2d: the fast restructurings with per-point 2D metric planes
    # (the rslu planes already carry pointwise recips; MT reads a pruned
    # full-plane stack through met_map instead of latitude rows)
    assert not fast2d or (static_rslu and metrics_2d and met_map), \
        "fast2d needs static planes, 2D metrics, and a met row map"
    fast = bool(static_rslu and (not metrics_2d or fast2d))
    hrc = hr_const if (hr_const is not None and ffs and fast) else None
    spx = ({n: i for i, n in enumerate(
        plane_names(ffs, ksw, mu_const, metrics_2d, hr_const=hrc,
                    fast2d=fast2d))}
        if static_rslu else None)

    uniform = UNIFORM_SHAPES
    # Round-5 arithmetic reductions (all fast-mode; see the builder
    # docstring): elide_sel and q4 are BIT-EXACT, share_prev regroups
    # (f32 round-off vs the two-interp order).
    assert not (elide_sel or q4 or share_prev) or fast, \
        "elide_sel/q4/share_prev are fast-mode levers"
    if share_prev and (not uniform or NARROW_CHAIN):
        # the probe-only graph modes (sliced shapes / narrow chain)
        # change frame shapes across chained steps; share_prev needs
        # matching frames, so it demotes rather than blocking the probe
        share_prev = False
    # q4 scalar rescales: the 1/4 advection-interpolation factor moves
    # into the rslu_u/rslu_v static planes (host-side; power of two ->
    # exact), so hu/hv/hup/hvp and the fluxes arrive pre-quartered and
    # the per-point F/G/K/L 0.25 multiplies vanish. Every compensating
    # constant below is an exact exponent shift.
    g_s = -4.0 * g if q4 else -g                # slx/sly pressure scalar
    tau_n = 0.5 * tau if q4 else 2.0 * tau      # un/vn numerator row
    tau_c = -8.0 * tau if q4 else -2.0 * tau    # continuity row
    thr_uv = 0.1875 if q4 else 0.75             # encoded-mask thresholds

    def kernel(*refs):
        if uniform:
            # Uniform-shape mode: every stage works on the full window
            # (tx + 2*MARGIN rows); shifts are rolls in BOTH axes, halo
            # bookkeeping collapses. Wrap-around garbage stays within the
            # margins (cumulative stencil reach <= 4 < MARGIN — the same
            # argument as the lane rolls), and the final output slice
            # drops them. One shape for the whole graph keeps the Mosaic
            # compile fast; the per-stage extra rows cost ~(1 + 2M/tx)
            # redundant VPU work.
            def sl(a, h_in, h_out, dm=0, dn=0):
                out = a
                if dm:
                    out = pltpu.roll(out, (-dm) % out.shape[0], 0)
                return _roll_y(out, dn, Ys)
        else:
            def sl(a, h_in, h_out, dm=0, dn=0):
                """Shifted view: halo h_in -> h_out, offset (dm, dn)."""
                off = h_in - h_out + dm
                rows = a.shape[0] - 2 * h_in + 2 * h_out
                out = jax.lax.slice(a, (off, 0), (off + rows, Ys))
                return _roll_y(out, dn, Ys)

        k = 0
        lu8 = hr8 = None
        if has_lu:
            lu8 = refs[k][...]
            k += 1
        if has_hr:
            hr8 = refs[k][...]
            k += 1
        if stacked:
            # ONE (6+2T, rows, Ys) window carries the whole state: the
            # pipeline issues a single input DMA + a single output DMA
            # per tile instead of 12+ (per-window setup dominates the
            # copy floor — scripts/roofline_probe.py stacked mode)
            s_ref = refs[k]
            k += 1
            ssh8, sshp8, u8, up8, v8, vp8 = (s_ref[i] for i in range(6))
        else:
            ssh8, sshp8, u8, up8, v8, vp8 = (r[...]
                                             for r in refs[k:k + 6])
            k += 6
        met_ref = refs[k]
        k += 1
        planes_ref = plane_frefs = None
        if static_rslu:
            if resident_planes:
                # static planes ride as n_pl FULL-ARRAY const-index VMEM
                # blocks (fetched from HBM once, resident across the
                # whole grid); SP reads this tile's rows directly —
                # drops ~40% of the per-tile input DMA
                plane_frefs = refs[k:k + n_pl]
                k += n_pl
            else:
                planes_ref = refs[k]
                k += 1
        if stacked:
            tr8 = [s_ref[6 + i] for i in range(2 * n_tracers)]
            out_ref = refs[-2]         # (6+2T, tx, Ys) stacked output
        else:
            tr8 = [r[...] for r in refs[k:k + 2 * n_tracers]]
            outs = refs[k + 2 * n_tracers:-1]
        omax_ref = refs[-1]   # (8, 128) VMEM block: max |ssh|, this tile

        # Narrow-chain frame state: cur["cut"] rows are cropped from
        # each side of the window for the current chained step; every
        # static-plane read goes through C() so masks/metrics stay
        # row-aligned with the narrowed state frames.
        cur = {"cut": 0}

        def C(a):
            c = cur["cut"]
            return a[c:-c] if c else a

        # Metric planes: 0 dx, 1 dy, 2 dxt, 3 dyt, 4 dxh, 5 dyh, 6 dxb,
        # 7 dyb, 8 rlh_s, 9 1/(dx*dy), 10-15 reciprocals of 2-7 (host-
        # precomputed — divisions are the dominant VPU cost otherwise).
        # Profile mode: met is (N_PROF, Ys) latitude rows, broadcast
        # across rows at any halo (x-uniform metrics). 2D mode (bipolar /
        # curvilinear grids): met is (16, Xs, Ys) full planes; each use
        # site names its halo so the window is sliced like the state.
        if metrics_2d:
            def MT(j, h, dm=0, dn=0):
                j2 = met_map[j] if met_map is not None else j
                return sl(C(met_ref[j2]), M, h, dm, dn)
        else:
            met = met_ref[...]      # (N_PROF, Ys) latitude profiles

            def MT(j, h, dm=0, dn=0):
                return _roll_y(met[j:j + 1, :], dn, Ys)
        inv2tau = float(1.0 / (2.0 * tau))

        if resident_planes:
            _prow0 = pl.program_id(0) * lay.tx

            def SP(name, h):
                """This tile's window rows of the resident plane."""
                return sl(C(plane_frefs[spx[name]][
                    pl.ds(_prow0, lay.tx + 2 * M), :]), M, h)
        else:
            def SP(name, h):
                """Static-plane slice (see plane_names)."""
                return sl(C(planes_ref[spx[name]]), M, h)

        def one_step(hb, ho, state, tracers, prev_dep=None):
            """One full model step: inputs at base halo ``hb``, outputs
            at halo ``ho`` (hb >= ho + 4, the per-step stencil reach).
            ``prev_dep``: the previous chained step's (hu, hv, hup, hvp)
            metric-weighted depth interps — see share_prev below."""
            ssh8, sshp8, u8, up8, v8, vp8 = state

            def LU(h, dm=0, dn=0):
                return sl(C(lu8), M, h, dm, dn)

            def WLCU(h):
                return (LU(h) * LU(h, 1, 0)) > 0.5

            def WLCV(h):
                return (LU(h) * LU(h, 0, 1)) > 0.5

            def WLUU(h):
                return (LU(h) * LU(h, 1, 0) * LU(h, 0, 1)
                        * LU(h, 1, 1)) > 0.5

            # ---- depth interpolations (hh_init/hh_update, depth.f90) --
            # hq = h_r + ssh*ffs on T; area-weighted onto U/V/H points.
            # The weighted column aq = hq*dx*dy*lu is shared by all three
            # interps. No wet-select is needed: aq carries the lu factor,
            # so an all-land neighborhood yields an exactly-zero numerator
            # (and rslu = 1).
            def _rslu_u(h):
                if static_rslu:
                    return SP("rslu_u", h)
                slu = LU(h) + LU(h, 1, 0)
                return jnp.where(slu > 1.5, 0.5, 1.0)

            def _rslu_v(h):
                if static_rslu:
                    return SP("rslu_v", h)
                slu = LU(h) + LU(h, 0, 1)
                return jnp.where(slu > 1.5, 0.5, 1.0)

            def _rslu_h(h):
                if static_rslu:
                    return SP("rslu_h", h)
                slu = (LU(h) + LU(h, 1, 0) + LU(h, 0, 1) + LU(h, 1, 1))
                # slu in {0..4}; select the reciprocal (1/3 rounds once,
                # same as the division up to 1 ulp)
                return jnp.where(
                    slu > 3.5, 0.25,
                    jnp.where(slu > 2.5, np.float32(1.0 / 3.0),
                              jnp.where(slu > 1.5, 0.5, 1.0)))

            # In fast mode the u/v interps return the metric-weighted
            # depths hhu*dyh / hhv*dxh (one profile factor instead of
            # two): every consumer (continuity fluxes, pressure gradient,
            # bp chains, tracer transports) wants exactly those products —
            # and the remaining 1/dxt / 1/dyt / 1/(dxb*dyb) profile
            # factors are premultiplied into the rslu static planes
            # (static_planes interp_recips), so each interpolation costs
            # ONE multiply off its numerator.
            u_mt = lambda h: MT(10, h) * MT(13, h)         # 1/dxt*1/dyh
            v_mt = lambda h: MT(12, h) * MT(11, h)         # 1/dxh*1/dyt

            def interp_u(h, aq0, haq):
                """aq0 carries halo haq >= h+1. slu in {0,1,2}: the
                reciprocal is an exact select (or a precomputed static
                plane), no division."""
                s = sl(aq0, haq, h) + sl(aq0, haq, h, 1, 0)
                if fast:
                    return s * _rslu_u(h)   # plane carries rslu/dxt
                return s * _rslu_u(h) * u_mt(h)

            def interp_v(h, aq0, aq0y, haq):
                """aq0y = aq0 lane-rolled by +1 (shared across interps)."""
                s = sl(aq0, haq, h) + sl(aq0y, haq, h)
                if fast:
                    return s * _rslu_v(h)   # plane carries rslu/dyt
                return s * _rslu_v(h) * v_mt(h)

            def interp_h(h, aq0, aq0y, haq):
                q = (sl(aq0, haq, h) + sl(aq0, haq, h, 1, 0)
                     + sl(aq0y, haq, h) + sl(aq0y, haq, h, 1, 0))
                if fast:
                    return q * _rslu_h(h)   # plane carries rslu/(dxb*dyb)
                return q * _rslu_h(h) \
                    * (MT(14, h) * MT(15, h))          # 1/(dxb*dyb)

            if fast:
                def aq_of(h, src):
                    # ludxdy / hrludxdy fold the lu gating and metric
                    # product into one mul-add:
                    # aq = ssh*lu*dx*dy + hr*lu*dx*dy  (ffs=1);
                    # constant bathymetry folds the hr plane into a
                    # scalar: aq = (ssh + hr)*lu*dx*dy
                    if ffs and hrc is not None:
                        return (sl(src, hb, h) + hrc) * SP("ludxdy", h)
                    if ffs:
                        return sl(src, hb, h) * SP("ludxdy", h) \
                            + SP("hrludxdy", h)
                    return SP("hrludxdy", h)
            else:
                def aq_of(h, src):
                    hq = sl(C(hr8), M, h) + sl(src, hb, h) * float(ffs)
                    # (dx*dy) groups metric*metric so the chain stays 2
                    # full-array muls off the state in profile mode
                    return hq * (MT(0, h) * MT(1, h)) * LU(h)

            def roll_y1(h, a):
                """One shared lane roll per aq family."""
                return sl(a, h, h, 0, 1)

            # current-level depths (== new-level: hqn = h_r + ssh = hq);
            # halo 3 so the deeper chains below stay in budget
            h4, h3, h2, h1 = 4 + ho, 3 + ho, 2 + ho, 1 + ho
            aq_cur4 = aq_of(h4, ssh8)
            aq_cur4y = roll_y1(h4, aq_cur4)
            if fast:
                # share the u-numerator with the h-interp: the 4-point
                # sum is the 2-point sum plus its own lane roll
                # (exact: rolls commute with the adds), replacing two
                # of interp_h's adds and its (1,1)-shifted term
                su3 = sl(aq_cur4, h4, h3) + sl(aq_cur4, h4, h3, 1, 0)
                hu3 = su3 * _rslu_u(h3)
                hv3 = (sl(aq_cur4, h4, h3) + sl(aq_cur4y, h4, h3)) \
                    * _rslu_v(h3)
                hh3 = (su3 + sl(su3, h3, h3, 0, 1)) * _rslu_h(h3)
            else:
                hu3 = interp_u(h3, aq_cur4, h4)
                hv3 = interp_v(h3, aq_cur4, aq_cur4y, h4)
                hh3 = interp_h(h3, aq_cur4, aq_cur4y, h4)
            # previous-level depths (pointwise consumers in update_uv)
            if prev_dep is not None:
                # share_prev: the previous chained step already interped
                # hu/hv/hup/hvp, and this step's sshp is its FILTER
                # output. aq is affine in ssh with both coefficients 0
                # on land and ts1 + 2*ts2 == 1 exactly, so the filter
                # commutes through the (linear) interpolation sums:
                #   hup = interp(aq(ts1*ssh + ts2*(sshn + sshp)))
                #       = ts1*hu_prev + ts2*(hu_cur + hup_prev)
                # — three cheap ops replacing the aq_prev fma, two
                # interps, and their two rolls (f32 regrouping only).
                phu, phv, phup, phvp = prev_dep
                hup1 = (1.0 - ts) * phu + (0.5 * ts) * (hu3 + phup)
                hvp1 = (1.0 - ts) * phv + (0.5 * ts) * (hv3 + phvp)
            else:
                aq_prev2 = aq_of(h2, sshp8)
                hup1 = interp_u(h1, aq_prev2, h2)
                hvp1 = interp_v(h1, aq_prev2, roll_y1(h2, aq_prev2), h2)

            # ---- continuity: sshn at halo 2 (sw_update_ssh_kernel) ----
            # uflux3/vflux3 double as uv_trans's u*dyh*hu / v*dxh*hv
            if fast:
                uflux3 = sl(u8, hb, h3) * hu3   # hu3 already carries dyh
                vflux3 = sl(v8, hb, h3) * hv3   # hv3 already carries dxh
            else:
                uflux3 = sl(u8, hb, h3) * hu3 * MT(5, h3)
                vflux3 = sl(v8, hb, h3) * hv3 * MT(4, h3)
            fluxdiv2 = (sl(uflux3, h3, h2) - sl(uflux3, h3, h2, -1, 0)
                        + sl(vflux3, h3, h2) - sl(vflux3, h3, h2, 0, -1))
            if fast:
                # the lu select is redundant here: every consumer
                # re-masks (final writes select by wlu0; tracer aq
                # carries the LU factor), and land fluxes are exactly
                # zero via hu/hv. The -2tau scalar folds into the
                # (1, Ys) profile row — a row-sized op instead of a
                # full-array multiply.
                sshn2 = sl(sshp8, hb, h2) \
                    + fluxdiv2 * (tau_c * MT(9, h2))
            else:
                wlu2 = LU(h2) > 0.5
                sshn2 = jnp.where(
                    wlu2,
                    sl(sshp8, hb, h2)
                    - 2.0 * tau * (fluxdiv2 * MT(9, h2)), 0.0)

            # wet masks shared by advection / viscosity / momentum /
            # tracers
            u_c = sl(u8, hb, h2)
            v_c = sl(v8, hb, h2)
            if fast:
                u_y1_2 = sl(u8, hb, h2, 0, 1)  # the section's only rolls
                v_y1_2 = sl(v8, hb, h2, 0, 1)
                u_x1_2 = sl(u8, hb, h2, 1, 0)
                v_x1_2 = sl(v8, hb, h2, 1, 0)
                s2u = u_y1_2 + u_c             # shared: G2/M2/Coriolis
                s2v = v_x1_2 + v_c             # shared: L2/H2/Coriolis

                # the staggered wet masks are ENCODED in the rslu planes
                # (see plane_names): both-wet <=> reciprocal 1/2, all-
                # four-wet <=> 1/4; the thresholds ride the same metric
                # rows the planes were premultiplied with, so a compare
                # against a scaled (1, Ys) row replaces a streamed plane
                def WLCU_f(h):
                    return SP("rslu_u", h) < thr_uv * MT(10, h)

                def WLCV_f(h):
                    return SP("rslu_v", h) < thr_uv * MT(11, h)

                def WLUU_f(h):
                    return SP("rslu_h", h) \
                        < 0.29 * (MT(14, h) * MT(15, h))

                wlcu1 = WLCU_f(h1)
                wlcv1 = WLCV_f(h1)
            else:
                wlcu1 = WLCU(h1)
                wlcv1 = WLCV(h1)

            # ---- momentum advection (uv_trans_vort + uv_trans) ----
            if trans and fast:
                # Profile-mode vorticity: with x-uniform metrics the four
                # metric-weighted differences collapse onto three
                # precomputed profile rows (16: dyt-dyb,
                # 17: dxt(n+1)-dxb, 18: dxt-dxb):
                #   vort = (v(m+1)-v)*(dyt-dyb) - u(n+1)*(dxt(n+1)-dxb)
                #          + u*(dxt-dxb)
                # — 3 muls off the state instead of the vd_t/ud_t halo-3
                # products plus four differences. Masks are static
                # planes; every 0.25 folds into one end-of-chain scaling.
                wluu_b2 = WLUU_f(h2)
                # rows 16-18 carry the advection 1/4 (folded at build),
                # so vort/H2/M2 arrive pre-scaled like the MT21-folded
                # Coriolis terms — which lets the Coriolis pair MERGE
                # into the advection tail below
                vort2 = jnp.where(
                    wluu_b2,
                    (v_x1_2 - v_c) * MT(16, h2)
                    - u_y1_2 * MT(17, h2)
                    + u_c * MT(18, h2), 0.0)
                ud2 = sl(uflux3, h3, h2)
                ud2x = sl(uflux3, h3, h2, 1, 0)
                ud2y = sl(uflux3, h3, h2, 0, 1)
                vd2 = sl(vflux3, h3, h2)
                vd2x = sl(vflux3, h3, h2, 1, 0)
                vd2y = sl(vflux3, h3, h2, 0, 1)
                # telescoped edge fluxes (see the non-fast branch), each
                # pre-scaled by 1/4 on its F/G/K/L-private factor; the
                # luu mask is static. With q4 the 1/4 already rides the
                # rslu_u/rslu_v planes (hu/hv and hence ud/vd arrive
                # quartered), so the four per-point scalar multiplies
                # vanish — exactly (power-of-two scaling).
                if q4:
                    F2 = (ud2 + ud2x) * (u_c + u_x1_2)
                    G2 = (vd2 + vd2x) * jnp.where(wluu_b2, s2u, 0.0)
                    K2 = (vd2 + vd2y) * (v_c + v_y1_2)
                    L2 = (ud2 + ud2y) * s2v
                else:
                    F2 = (ud2 + ud2x) * ((u_c + u_x1_2) * 0.25)
                    G2 = ((vd2 + vd2x) * 0.25) \
                        * jnp.where(wluu_b2, s2u, 0.0)
                    K2 = (vd2 + vd2y) * ((v_c + v_y1_2) * 0.25)
                    L2 = ((ud2 + ud2y) * 0.25) * s2v
                # Coriolis (MT21 = rlh*dxb*dyb/4) merges with the
                # advection tail TWICE over:
                # 1. the vorticity and Coriolis h-point factors share
                #    their s2u/s2v multipliers, so
                #      H2 + C2v = (vort + rlh_row)*hh * s2v  (= Px)
                #      M2 + C2u = (vort + rlh_row)*hh * s2u  (= Ty)
                #    — 4 full-array ops instead of 8;
                # 2. all terms sharing a shift collapse into ONE rolled
                #    array — lane/sublane rolls cost ~2.4x an ALU op
                #    (scripts/vpu_shift_probe.py), so
                #      rx_adv + cpair_x = Px - F2 - G2 + (Px+G2)(n-1)
                #                         + F2(m-1)
                #    does the work of 4 rolls in 2.
                # The wlcu/wlcv selects are redundant (un1/vn1 re-select).
                vc2 = (vort2 + MT(21, h2)) * sl(hh3, h3, h2)
                Px = vc2 * s2v
                Ty = vc2 * s2u
                Rx = Px + G2
                acx1 = (sl(Px, h2, h1) - sl(F2, h2, h1)
                        - sl(G2, h2, h1)
                        + sl(Rx, h2, h1, 0, -1)
                        + sl(F2, h2, h1, -1, 0))
                Sy = L2 - Ty
                acy1 = (-sl(Ty, h2, h1) - sl(L2, h2, h1)
                        - sl(K2, h2, h1)
                        + sl(Sy, h2, h1, -1, 0)
                        + sl(K2, h2, h1, 0, -1))
            elif trans:
                wluu2 = WLUU(h2)
                vd_t = sl(v8, hb, h3) * MT(3, h3)     # v*dyt at h3
                ud_t = sl(u8, hb, h3) * MT(2, h3)
                vort2 = jnp.where(
                    wluu2,
                    (sl(vd_t, h3, h2, 1, 0) - sl(vd_t, h3, h2))
                    - (sl(ud_t, h3, h2, 0, 1) - sl(ud_t, h3, h2))
                    - ((sl(v8, hb, h2, 1, 0) - v_c) * MT(7, h2)
                       - (sl(u8, hb, h2, 0, 1) - u_c) * MT(6, h2)), 0.0)

                ud3 = uflux3                       # u*dyh*hu at h3
                vd3 = vflux3
                vorth2 = vort2 * sl(hh3, h3, h2)
                luu2f = jnp.where(wluu2, 1.0, 0.0)

                # Flux-form telescoping (uv_trans_kernel): the minus-side
                # flux at a cell IS the plus-side flux of its neighbor,
                # so each edge-flux field is computed ONCE at halo 2 and
                # its shifted view supplies the minus side —
                # bit-identical to evaluating both, at ~half the VPU
                # work.
                #   F(m,n) = (ud(m)+ud(m+1))(u(m)+u(m+1))/4
                #   G(m,n) = (vd(m)+vd(m+1))(u(n)+u(n+1))luu/4
                #   K(m,n) = (vd(n)+vd(n+1))(v(n)+v(n+1))/4
                #   L(m,n) = (ud(n)+ud(n+1))(v(m)+v(m+1))/4
                F2 = (sl(ud3, h3, h2) + sl(ud3, h3, h2, 1, 0)) \
                    * (sl(u8, hb, h2) + sl(u8, hb, h2, 1, 0)) * 0.25
                G2 = (sl(vd3, h3, h2) + sl(vd3, h3, h2, 1, 0)) \
                    * (sl(u8, hb, h2, 0, 1) + sl(u8, hb, h2)) \
                    * (luu2f * 0.25)
                K2 = (sl(vd3, h3, h2) + sl(vd3, h3, h2, 0, 1)) \
                    * (sl(v8, hb, h2) + sl(v8, hb, h2, 0, 1)) * 0.25
                L2 = (sl(ud3, h3, h2) + sl(ud3, h3, h2, 0, 1)) \
                    * (sl(v8, hb, h2, 1, 0) + sl(v8, hb, h2)) * 0.25
                # vorticity double-terms telescope the same way; the
                # (v+v_x1)/(u+u_y1) factors are shared with Coriolis
                s2v = sl(v8, hb, h2, 1, 0) + sl(v8, hb, h2)
                s2u = sl(u8, hb, h2, 0, 1) + sl(u8, hb, h2)
                H2 = vorth2 * s2v              # rx term; + H2(n-1)
                M2 = vorth2 * s2u              # ry term; + M2(m-1)

                rx_adv1 = jnp.where(
                    wlcu1,
                    -(sl(F2, h2, h1) - sl(F2, h2, h1, -1, 0)
                      + sl(G2, h2, h1) - sl(G2, h2, h1, 0, -1))
                    + (sl(H2, h2, h1) + sl(H2, h2, h1, 0, -1)) * 0.25,
                    0.0)
                ry_adv1 = jnp.where(
                    wlcv1,
                    -(sl(L2, h2, h1) - sl(L2, h2, h1, -1, 0)
                      + sl(K2, h2, h1) - sl(K2, h2, h1, 0, -1))
                    - (sl(M2, h2, h1) + sl(M2, h2, h1, -1, 0)) * 0.25,
                    0.0)
            else:
                rx_adv1 = 0.0
                ry_adv1 = 0.0
                if not fast:
                    s2v = sl(v8, hb, h2, 1, 0) + sl(v8, hb, h2)
                    s2u = sl(u8, hb, h2, 0, 1) + sl(u8, hb, h2)

            # ---- lateral viscosity (stress_components + uv_diff2) ----
            if visc and fast:
                # static masks as 0/1 multiplies; dy/dx & dx/dy are
                # profile rows 19/20; the rx/ry selects are dropped
                # (un1 re-selects)
                q3 = sl(up8, hb, h3) * MT(13, h3)
                r3 = sl(vp8, hb, h3) * MT(12, h3)
                str_t2 = (MT(19, h2) * (sl(q3, h3, h2)
                                        - sl(q3, h3, h2, -1, 0))
                          - MT(20, h2) * (sl(r3, h3, h2)
                                          - sl(r3, h3, h2, 0, -1))) \
                    * SP("wlu", h2)
                s1 = sl(up8, hb, h3) * MT(10, h3)
                s2 = sl(vp8, hb, h3) * MT(11, h3)
                str_s2 = jnp.where(
                    WLUU_f(h2),
                    (MT(6, h2) * MT(15, h2))
                    * (sl(s1, h3, h2, 0, 1) - sl(s1, h3, h2))
                    + (MT(7, h2) * MT(14, h2))
                    * (sl(s2, h3, h2, 1, 0) - sl(s2, h3, h2)), 0.0)
                hq2 = sl(C(hr8), M, h2) + sl(ssh8, hb, h2) * float(ffs)
                t2 = hq2 * str_t2
                a2 = (MT(1, h2) * MT(1, h2) * mu_const) * t2
                b2 = (MT(0, h2) * MT(0, h2) * mu_const) * t2
                hs2 = sl(hh3, h3, h2) * str_s2
                D2 = (MT(6, h2) * MT(6, h2) * mu_const) * hs2
                E2 = (MT(7, h2) * MT(7, h2) * mu_const) * hs2
                rx_dif1 = (sl(a2, h2, h1, 1, 0) - sl(a2, h2, h1)) \
                    * MT(13, h1) \
                    + (sl(D2, h2, h1) - sl(D2, h2, h1, 0, -1)) * MT(10, h1)
                ry_dif1 = -(sl(b2, h2, h1, 0, 1) - sl(b2, h2, h1)) \
                    * MT(12, h1) \
                    + (sl(E2, h2, h1) - sl(E2, h2, h1, -1, 0)) * MT(11, h1)
            elif visc:
                q3 = sl(up8, hb, h3) * MT(13, h3)
                r3 = sl(vp8, hb, h3) * MT(12, h3)
                dy_dx = MT(1, h2) / MT(0, h2)  # profile mode: row ratios,
                dx_dy = MT(0, h2) / MT(1, h2)  # divisions touch Ys points
                wlu2v = LU(h2) > 0.5
                str_t2 = jnp.where(
                    wlu2v,
                    dy_dx * (sl(q3, h3, h2) - sl(q3, h3, h2, -1, 0))
                    - dx_dy * (sl(r3, h3, h2) - sl(r3, h3, h2, 0, -1)),
                    0.0)
                s1 = sl(up8, hb, h3) * MT(10, h3)
                s2 = sl(vp8, hb, h3) * MT(11, h3)
                str_s2 = jnp.where(
                    WLUU(h2),
                    (MT(6, h2) * MT(15, h2)) * (sl(s1, h3, h2, 0, 1)
                                                - sl(s1, h3, h2))
                    + (MT(7, h2) * MT(14, h2)) * (sl(s2, h3, h2, 1, 0)
                                                  - sl(s2, h3, h2)), 0.0)

                hq2 = sl(C(hr8), M, h2) + sl(ssh8, hb, h2) * float(ffs)
                t2 = hq2 * str_t2              # shared T-point stress
                a2 = (MT(1, h2) * MT(1, h2) * mu_const) * t2
                b2 = (MT(0, h2) * MT(0, h2) * mu_const) * t2
                # H-point stress terms telescope (uv_diff2_kernel): the
                # minus side is the same field at (n-1)/(m-1) — shifting
                # the product also shifts its metric factor, exactly as
                # the reference evaluates dxb/dyb at the shifted point
                hs2 = sl(hh3, h3, h2) * str_s2
                D2 = (MT(6, h2) * MT(6, h2) * mu_const) * hs2
                E2 = (MT(7, h2) * MT(7, h2) * mu_const) * hs2
                rx_dif1 = jnp.where(
                    wlcu1,
                    (sl(a2, h2, h1, 1, 0) - sl(a2, h2, h1)) * MT(13, h1)
                    + (sl(D2, h2, h1) - sl(D2, h2, h1, 0, -1))
                    * MT(10, h1),
                    0.0)
                ry_dif1 = jnp.where(
                    wlcv1,
                    -(sl(b2, h2, h1, 0, 1) - sl(b2, h2, h1)) * MT(12, h1)
                    + (sl(E2, h2, h1) - sl(E2, h2, h1, -1, 0))
                    * MT(11, h1),
                    0.0)
            else:
                rx_dif1 = 0.0
                ry_dif1 = 0.0

            # ---- momentum update at halo 1 (sw_update_uv) ----
            hu1 = sl(hu3, h3, h1)
            hv1 = sl(hv3, h3, h1)
            ssh_c2 = sl(ssh8, hb, h2)
            up1 = sl(up8, hb, h1)
            vp1 = sl(vp8, hb, h1)

            if not (fast and trans):
                # Coriolis double-terms telescope like the advection
                # ones: C2v(n-1) / C2u(m-1) are the second summands.
                # (In the fast+trans path these merged into acx1/acy1.)
                if fast:
                    # row 21 = rlh_s*dxb*dyb*0.25 — the 1/4 folds into
                    # the precomputed profile
                    corio2 = MT(21, h2) * sl(hh3, h3, h2)
                else:
                    corio2 = (MT(8, h2) * MT(6, h2) * MT(7, h2)) \
                        * sl(hh3, h3, h2)
                C2v = corio2 * s2v
                C2u = corio2 * s2u
                cpair_x = sl(C2v, h2, h1) + sl(C2v, h2, h1, 0, -1)
                cpair_y = sl(C2u, h2, h1) + sl(C2u, h2, h1, -1, 0)
                if not fast:
                    cpair_x = cpair_x * 0.25
                    cpair_y = cpair_y * 0.25

            if fast:
                # hu/hv carry dyh/dxh already; the 0-division at all-land
                # points yields inf/nan in the *discarded* select branch.
                # The bp metric factor cancels between numerator and
                # denominator:
                #   (up*bp0 + grx)/bp = (up*hup + grx*2tau/dxt)/hu
                # so the update costs one full-array multiply less per
                # component; 2tau/dxt is a (1, Ys) row.
                slx = (sl(ssh_c2, h2, h1, 1, 0) - sl(ssh_c2, h2, h1)) \
                    * hu1 * g_s
                sly = (sl(ssh_c2, h2, h1, 0, 1) - sl(ssh_c2, h2, h1)) \
                    * hv1 * g_s
                if trans:
                    grx = slx + rx_dif1 + acx1
                    gry = sly + ry_dif1 + acy1
                else:
                    grx = slx + rx_dif1 + cpair_x
                    gry = sly + ry_dif1 - cpair_y
                if rcp_div:
                    # f32 divide costs +1.9 carriers on this VPU;
                    # approx reciprocal + 1 Newton step (near-f32-
                    # accurate; tested to 1e-4 over 20 steps) costs
                    # +1.27 (scripts/vpu_op_probe.py). At land points
                    # 1/0 = inf, then the Newton step's 0*inf makes the
                    # discarded branch NaN; jnp.where selects it away.
                    ru = pl.reciprocal(hu1, approx=True)
                    ru = ru * (2.0 - hu1 * ru)
                    rv = pl.reciprocal(hv1, approx=True)
                    rv = rv * (2.0 - hv1 * rv)
                    un1 = jnp.where(
                        wlcu1,
                        (up1 * hup1
                         + grx * (tau_n * MT(10, h1))) * ru,
                        0.0)
                    vn1 = jnp.where(
                        wlcv1,
                        (vp1 * hvp1
                         + gry * (tau_n * MT(11, h1))) * rv,
                        0.0)
                else:
                    un1 = jnp.where(
                        wlcu1,
                        (up1 * hup1
                         + grx * (tau_n * MT(10, h1))) / hu1,
                        0.0)
                    vn1 = jnp.where(
                        wlcv1,
                        (vp1 * hvp1
                         + gry * (tau_n * MT(11, h1))) / hv1,
                        0.0)
            else:
                bpm_u = MT(2, h1) * MT(5, h1) * inv2tau  # dxt*dyh/2tau
                bpm_v = MT(3, h1) * MT(4, h1) * inv2tau  # dyt*dxh/2tau
                bp_u = hu1 * bpm_u          # hhun == hhu (see docstring)
                bp0_u = hup1 * bpm_u
                slx = (sl(ssh_c2, h2, h1, 1, 0) - sl(ssh_c2, h2, h1)) \
                    * hu1 * (MT(5, h1) * (-g))
                grx = slx + rx_dif1 + rx_adv1 + cpair_x
                un1 = jnp.where(
                    wlcu1,
                    (up1 * bp0_u + grx) / jnp.where(wlcu1, bp_u, 1.0),
                    0.0)
                bp_v = hv1 * bpm_v
                bp0_v = hvp1 * bpm_v
                sly = (sl(ssh_c2, h2, h1, 0, 1) - sl(ssh_c2, h2, h1)) \
                    * hv1 * (MT(4, h1) * (-g))
                gry = sly + ry_dif1 + ry_adv1 - cpair_y
                vn1 = jnp.where(
                    wlcv1,
                    (vp1 * bp0_v + gry) / jnp.where(wlcv1, bp_v, 1.0),
                    0.0)

            # ---- leapfrog rotation + filter (sw_next_step) ----
            if fast:
                wlu0 = SP("ludxdy", ho) > 0.5
                if not elide_sel:
                    wlcu0 = WLCU_f(ho)
                    wlcv0 = WLCV_f(ho)
            else:
                wlu0 = LU(ho) > 0.5
                wlcu0 = WLCU(ho)
                wlcv0 = WLCV(ho)
            ssh0 = sl(ssh8, hb, ho)
            sshp0 = sl(sshp8, hb, ho)
            u0 = sl(u8, hb, ho)
            v0 = sl(v8, hb, ho)
            sshn0 = sl(sshn2, h2, ho)
            un0 = sl(un1, h1, ho)
            vn0 = sl(vn1, h1, ho)
            up0 = sl(up8, hb, ho)
            vp0 = sl(vp8, hb, ho)

            # filter rewritten as f + ts2*(n - 2f + p) = (1-ts)*f
            # + ts2*(n + p): one op fewer per filtered field
            ts2 = ts * 0.5                  # trace-time constant folds
            ts1 = 1.0 - ts
            ssh_new0 = jnp.where(wlu0, sshn0, ssh0)
            sshp_new0 = jnp.where(
                wlu0, ts1 * ssh0 + ts2 * (sshn0 + sshp0), sshp0)
            if elide_sel:
                # The velocity selects are REDUNDANT given the land-zero
                # invariant (pack masks u/up by wlcu, v/vp by wlcv; land
                # velocities are never written — sw_next_step only
                # updates wlcu/wlcv points): at non-wlcu cells un1's own
                # select yields 0 == u0, and the filter of three zeros
                # is 0 == up0, so dropping the four wheres is BIT-EXACT.
                # (ssh keeps its selects: sshn2 is nonzero on land cells
                # adjacent to wet — the flux divergence reaches them.)
                u_new0, up_new0 = un0, ts1 * u0 + ts2 * (un0 + up0)
                v_new0, vp_new0 = vn0, ts1 * v0 + ts2 * (vn0 + vp0)
            else:
                u_new0 = jnp.where(wlcu0, un0, u0)
                up_new0 = jnp.where(
                    wlcu0, ts1 * u0 + ts2 * (un0 + up0), up0)
                v_new0 = jnp.where(wlcv0, vn0, v0)
                vp_new0 = jnp.where(
                    wlcv0, ts1 * v0 + ts2 * (vn0 + vp0), vp0)
            new_state = (ssh_new0, sshp_new0, u_new0, up_new0,
                         v_new0, vp_new0)

            # ---- tracer pass (expl_tracer, runs after the SW step) ----
            new_tracers = []
            if n_tracers:
                # post-step depths: hh_init from the NEW (ssh, sshp) sets
                # hhu = interp(h_r + ssh_new), hhq_n = h_r,
                # hhq_p = h_r + sshp_new (tracer_interface.f90 bindings)
                if fast:
                    # land values of sshn2 are killed by the ludxdy plane
                    if ffs and hrc is not None:
                        aq_new2 = (sshn2 + hrc) * SP("ludxdy", h2)
                    elif ffs:
                        aq_new2 = sshn2 * SP("ludxdy", h2) \
                            + SP("hrludxdy", h2)
                    else:
                        aq_new2 = SP("hrludxdy", h2)
                else:
                    ssh_new2 = jnp.where(LU(h2) > 0.5, sshn2, ssh_c2)
                    aq_new2 = (sl(C(hr8), M, h2) + ssh_new2 * float(ffs)) \
                        * (MT(0, h2) * MT(1, h2)) * LU(h2)
                hun1 = interp_u(h1, aq_new2, h2)
                hvn1 = interp_v(h1, aq_new2, roll_y1(h2, aq_new2), h2)
                u_new1 = jnp.where(wlcu1, un1, sl(u8, hb, h1))
                v_new1 = jnp.where(wlcv1, vn1, sl(v8, hb, h1))

                if fast:
                    # flux masks hoisted onto the tracer-independent
                    # transport products (wlcu1/wlcv1 are the derived
                    # rslu-encoded masks, already at h1)
                    uh1 = jnp.where(wlcu1, u_new1 * hun1, 0.0)
                    vh1 = jnp.where(wlcv1, v_new1 * hvn1, 0.0)
                    diffusive = mu_const != 0.0
                    if diffusive:
                        hun1m = jnp.where(wlcu1, hun1, 0.0)
                        hvn1m = jnp.where(wlcv1, hvn1, 0.0)
                for t in range(n_tracers):
                    ff8 = tracers[2 * t]
                    ffp8 = tracers[2 * t + 1]

                    ff2 = sl(ff8, hb, h2)
                    # fluxes (tran_diff_fluxes_kernel): advective +
                    # diffusive
                    if not fast or diffusive:
                        dfdx = sl(ff2, h2, h1, 1, 0) - sl(ff2, h2, h1)
                        # (mu+mu)/2 * factor(=1) * dyh/dxt; in fast mode
                        # the dyh/dxh ride inside hun1/hvn1 already (and
                        # with q4 so does a 1/4 — compensated exactly in
                        # the scalar)
                        mu_c = 4.0 * mu_const if q4 else mu_const
                        mu_x = mu_c * (MT(10, h1) if fast
                                       else MT(5, h1) * MT(10, h1))
                        dfdy = sl(ff2, h2, h1, 0, 1) - sl(ff2, h2, h1)
                        mu_y = mu_c * (MT(11, h1) if fast
                                       else MT(4, h1) * MT(11, h1))
                    if fast:
                        adv_s = -2.0 if q4 else -0.5
                        fx1 = uh1 * ((sl(ff2, h2, h1)
                                      + sl(ff2, h2, h1, 1, 0)) * adv_s)
                        fy1 = vh1 * ((sl(ff2, h2, h1)
                                      + sl(ff2, h2, h1, 0, 1)) * adv_s)
                        if diffusive:
                            fx1 = fx1 + mu_x * hun1m * dfdx
                            fy1 = fy1 + mu_y * hvn1m * dfdy
                    else:
                        fx1 = jnp.where(
                            wlcu1,
                            (u_new1 * hun1)
                            * (sl(ff2, h2, h1) + sl(ff2, h2, h1, 1, 0))
                            * (MT(5, h1) * -0.5)
                            + mu_x * hun1 * dfdx, 0.0)
                        fy1 = jnp.where(
                            wlcv1,
                            (v_new1 * hvn1)
                            * (sl(ff2, h2, h1) + sl(ff2, h2, h1, 0, 1))
                            * (MT(4, h1) * -0.5)
                            + mu_y * hvn1 * dfdy, 0.0)

                    # leapfrog update (tran_diff_tracer_kernel):
                    # bp = hhq_n*area/2tau with hhq_n = h_r,
                    # bp0 with hhq_p = h_r + sshp_new*ffs
                    hr0 = sl(C(hr8), M, ho)
                    area0 = MT(0, ho) * MT(1, ho) * inv2tau
                    bp = hr0 * area0
                    bp0 = (hr0 + sshp_new0 * float(ffs)) * area0
                    rhs = (sl(fx1, h1, ho) - sl(fx1, h1, ho, -1, 0)
                           + sl(fy1, h1, ho) - sl(fy1, h1, ho, 0, -1))
                    ffp0 = sl(ffp8, hb, ho)
                    ff0 = sl(ff8, hb, ho)
                    bp_g = bp if fast else jnp.where(wlu0, bp, 1.0)
                    ffn0 = jnp.where(
                        wlu0, (bp0 * ffp0 + rhs) / bp_g, 0.0)
                    # filter + rotation (tracer_next_step_kernel); with
                    # elide_sel the land selects drop (ffn0 is already
                    # wlu0-selected to 0 and pack masks ff/ffp by wlu,
                    # so the land filter is 0 == ffp0 — bit-exact)
                    if elide_sel:
                        new_tracers.append(ffn0)
                        new_tracers.append(
                            (1.0 - ts) * ff0 + ts2 * (ffn0 + ffp0))
                    else:
                        new_tracers.append(jnp.where(wlu0, ffn0, ff0))
                        new_tracers.append(jnp.where(
                            wlu0, (1.0 - ts) * ff0 + ts2 * (ffn0 + ffp0),
                            ffp0))

            # ---- per-step stability reduction (check_ssh_err_kernel,
            # vel_ssh.f90:40-67 — the reference checks EVERY step) ----
            # max |ssh| over this tile's CENTER cells. Center regions
            # alone tile the domain, so coverage is complete at every
            # chained step; margin rows/lanes are excluded because they
            # are duplicates of a neighbour tile/shard's center (checked
            # there), land zeros, or — at the global edge — carried
            # array rows the out specs never write (undefined).
            sshx = ssh_new0
            if uniform:
                fm = M - cur["cut"]        # frame margin this step
                sshx = sshx[fm:-fm, :]
            elif ho:
                sshx = sshx[ho:-ho, :]     # rows at halo ho -> center
            if guard_col:
                sshx = sshx[:, guard_col:-guard_col]
            stepmax = jnp.max(jnp.abs(sshx))
            return (new_state, new_tracers, stepmax,
                    (hu3, hv3, hup1, hvp1))

        state = (ssh8, sshp8, u8, up8, v8, vp8)
        tracers = tr8
        hb = M
        mx = jnp.zeros((), jnp.float32)
        narrow = NARROW_CHAIN and uniform and steps_per_call > 1
        dep = None
        for s in range(steps_per_call):
            # chained steps: step outputs at halo 4*(remaining steps)
            # stay exact (per-step reach <= 4; masked selects keep land
            # cells at exactly 0, so lane-roll wrap garbage never
            # reaches a wet cell)
            ho = 4 * (steps_per_call - 1 - s)
            if narrow and s:
                # crop the consumed reach: step s runs on tx+2(M-4s)
                # rows — same per-cell arithmetic, fewer redundant rows
                state = tuple(x[4:-4] for x in state)
                tracers = [x[4:-4] for x in tracers]
                cur["cut"] += 4
            state, tracers, stepmax, dep_out = one_step(
                hb, ho, state, tracers, prev_dep=dep)
            if share_prev:
                dep = dep_out
            mx = jnp.maximum(mx, stepmax)
            hb = ho

        cc = out_col_crop        # 2D tiling: outputs are (tx, ty) lanes
        if uniform:
            fm = M - cur["cut"]
            final = [x[fm:-fm, cc:-cc] if cc else x[fm:-fm, :]
                     for x in (*state, *tracers)]
        else:
            final = [x[:, cc:-cc] if cc else x
                     for x in (*state, *tracers)]
        cur["cut"] = 0
        if stacked:
            for i, x in enumerate(final):
                out_ref[i] = x
        else:
            for o, x in zip(outs, final):
                o[...] = x
        omax_ref[...] = jnp.broadcast_to(mx, (8, 128))

    if not tile_guard:
        return kernel

    def guarded(wet_ref, *refs):
        """Land/pad-tile elision (the shard-level form of the reference's
        weight-0 block drop, decomposition.f90:505-578): the scalar-
        prefetch plane says whether this tile's valid cells contain any
        water. All-land (or all-pad) tiles skip the whole step and write
        exact zeros — the value land cells hold by construction."""
        n_out = 6 + 2 * n_tracers
        outs = (refs[-2:-1] if stacked
                else refs[len(refs) - n_out - 1:-1])
        omax_ref = refs[-1]
        tile = pl.program_id(0)
        if n_ty > 1:          # 2D (x, y) grid: flat wet-flag index
            tile = tile * n_ty + pl.program_id(1)
        active = wet_ref[tile] > 0

        @pl.when(active)
        def _():
            kernel(*refs)

        @pl.when(jnp.logical_not(active))
        def _():
            for o in outs:
                o[...] = jnp.zeros(o.shape, o.dtype)
            omax_ref[...] = jnp.zeros((8, 128), jnp.float32)

    return guarded


class _Val:
    """Read-only ref adapter: lets the windowed kernel body consume
    in-VMEM VALUES (the persistent walk's assembled windows) through its
    normal ``ref[...]`` / ``ref[i]`` reads."""

    def __init__(self, v):
        self.v = v

    def __getitem__(self, idx):
        if idx is Ellipsis:
            return self.v
        return self.v[idx]


class _Out:
    """Write-capture ref adapter for the kernel's output stores."""

    def __init__(self):
        self.v = None

    def __setitem__(self, idx, val):
        self.v = val


class _PlaneRefs:
    """Lazy per-plane window adapter: the kernel's ``planes_ref[j]``
    reads become dynamic row-slices of separate full-resident VMEM
    blocks (Mosaic CSEs the repeated identical loads)."""

    def __init__(self, refs, row0, rows):
        self.refs, self.row0, self.rows = refs, row0, rows

    def __getitem__(self, j):
        return self.refs[j][pl.ds(self.row0, self.rows), :]


def build_persistent_sw_step(lay: FusedLayout, lu_s, hhq_rest_s,
                             metrics_profile, tau: float,
                             time_smooth: float, ffs: int, trans: int,
                             ksw: int, mu_const: float = 0.0,
                             n_tracers: int = 0, nsteps: int = 1,
                             interpret: bool = False,
                             rslu_planes=None,
                             hr_const: float | None = None,
                             rcp_div: bool = False,
                             vmem_limit_bytes: int | None = None):
    """The persistent-VMEM megakernel: ``nsteps`` whole model steps in
    ONE pallas_call. The full prognostic state lives in VMEM scratch
    across a (nsteps+2, n_tiles) sequential grid — HBM sees exactly one
    domain read (t=0) and one write (t=nsteps+1); static planes/metrics
    ride as constant-index VMEM blocks (fetched once). Steady state is
    pure VPU: the windowed kernel's ~18% non-overlapped streaming share
    disappears, and no margin-chaining (steps_per_call) is needed.

    Per (t, i) iteration, tile i's 80-row window is assembled from the
    scratch state with an in-place OLD-ROW STASH walk: tile i-1 already
    overwrote rows [i*tx, i*tx+M), so their pre-step values ride an
    (M, Ys) stash written one iteration earlier — the same single-pass
    in-place stencil sweep a CPU cache-blocked stencil uses. The
    per-step |ssh| max accumulates in a scratch block (check_ssh_err
    cadence preserved).

    Restrictions (v1): x-uniform metrics (profile mode), uniform shapes,
    no 2D lane tiling / tile guard. Returns ``step(*fields) ->
    (fields', max)`` advancing ``nsteps`` steps.

    PROBE-ONLY: the mechanism probes measured the walk's fixed per-tile
    overhead at 2.6-4 us (BASELINE.md "Round-4 probes") — above the
    windowed pipeline — and the full-physics compiled form crashes the
    remote Mosaic service; the builder is kept for the interpret-mode
    parity tests and future toolchain re-probes. In compiled mode the
    output margin rows are never written by the pinned out windows, so
    ``step`` re-grounds them host-side below."""
    assert UNIFORM_SHAPES, "persistent walk requires the uniform graph"
    M, tx, Ys, Xs = lay.margin, lay.tx, lay.Ys, lay.Xs
    NT = lay.X // tx
    TXW = tx + 2 * M
    static_rslu = rslu_planes is not None
    fast = static_rslu
    visc = bool(ksw and mu_const != 0.0)
    has_lu = not fast
    has_hr = (not fast) or visc or (n_tracers > 0)
    nf = 6 + 2 * n_tracers
    n_pl = (np.asarray(rslu_planes).shape[0] if static_rslu else 0)

    inner = _make_kernel(lay, tau, time_smooth, ffs, trans, ksw,
                         mu_const, n_tracers, metrics_2d=False,
                         static_rslu=static_rslu, steps_per_call=1,
                         has_lu=has_lu, has_hr=has_hr,
                         tile_guard=False, guard_col=0,
                         hr_const=hr_const, rcp_div=rcp_div)

    def kernel(*refs):
        idx = 0
        ins = refs[idx:idx + nf]
        idx += nf
        lu_ref = hr_ref = None
        if has_lu:
            lu_ref = refs[idx]
            idx += 1
        if has_hr:
            hr_ref = refs[idx]
            idx += 1
        met_ref = refs[idx]
        idx += 1
        plane_refs = None
        if static_rslu:
            plane_refs = refs[idx:idx + n_pl]
            idx += n_pl
        outs = refs[idx:idx + nf]
        idx += nf
        omax_ref = refs[idx]
        idx += 1
        scr = refs[idx:idx + nf]
        idx += nf
        stash = refs[idx:idx + nf]
        idx += nf
        gmax = refs[idx]
        t = pl.program_id(0)
        i = pl.program_id(1)
        row0 = i * tx

        @pl.when(t == 0)
        def _():                       # initial load: HBM -> scratch
            for k in range(nf):
                scr[k][pl.ds(row0, TXW), :] = ins[k][...]

            @pl.when(i == 0)
            def _():
                gmax[...] = jnp.zeros((8, 128), jnp.float32)

        @pl.when((t > 0) & (t <= nsteps))
        def _():
            wins = []
            for k in range(nf):
                cur = scr[k][pl.ds(row0, TXW), :]
                # rows [row0, row0+M) were overwritten by tile i-1:
                # their OLD values ride the stash (i == 0 reads the
                # static land margin directly)
                prev = jnp.where(i > 0, stash[k][...], cur[:M])
                # next tile's old head, before this tile overwrites it
                stash[k][...] = cur[tx:tx + M]
                wins.append(jnp.concatenate([prev, cur[M:]], axis=0))
            vals = []
            if has_lu:
                vals.append(_Val(lu_ref[pl.ds(row0, TXW), :]))
            if has_hr:
                vals.append(_Val(hr_ref[pl.ds(row0, TXW), :]))
            vals += [_Val(w) for w in wins[:6]]
            vals.append(_Val(met_ref[...]))
            if static_rslu:
                vals.append(_PlaneRefs(plane_refs, row0, TXW))
            vals += [_Val(w) for w in wins[6:]]
            oad = [_Out() for _ in range(nf)]
            mad = _Out()
            inner(*vals, *oad, mad)
            for k in range(nf):
                scr[k][pl.ds(row0 + M, tx), :] = oad[k].v
            gmax[...] = jnp.maximum(gmax[...], mad.v)

        @pl.when(t == nsteps + 1)
        def _():                       # final flush: scratch -> HBM
            for k in range(nf):
                outs[k][...] = scr[k][pl.ds(row0 + M, tx), :]
            omax_ref[...] = gmax[...]

    # ---- specs: pinned index maps -> one DMA per block ---------------
    # (Element-typed dims: index maps return ELEMENT offsets. interpret
    # mode replays every block copy, so it uses plain per-tile maps —
    # the final flush is the last write and still wins.)
    if interpret:
        def in_ix(t, i):
            return (i * tx, 0)

        def out_ix(t, i):
            return (i * tx + M, 0)
    else:
        def in_ix(t, i):
            return (jnp.where(t == 0, i, NT - 1) * tx, 0)

        def out_ix(t, i):
            return (jnp.where(t == nsteps + 1, i, 0) * tx + M, 0)

    def const_ix(*a):
        return (0, 0)

    win_spec = pl.BlockSpec((pl.Element(TXW), pl.Element(Ys)), in_ix,
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((pl.Element(Xs), pl.Element(Ys)), const_ix,
                             memory_space=pltpu.VMEM)
    in_specs = [win_spec] * nf
    args = []
    if has_lu:
        in_specs.append(full_spec)
        args.append(jnp.asarray(lu_s, jnp.float32))
    if has_hr:
        in_specs.append(full_spec)
        args.append(jnp.asarray(hhq_rest_s, jnp.float32))
    in_specs.append(pl.BlockSpec((pl.Element(N_PROF), pl.Element(Ys)),
                                 const_ix, memory_space=pltpu.VMEM))
    args.append(jnp.asarray(metrics_profile, jnp.float32))
    if static_rslu:
        planes_np = np.asarray(rslu_planes, np.float32)
        for j in range(n_pl):
            in_specs.append(full_spec)
            args.append(jnp.asarray(planes_np[j]))

    out_specs = [pl.BlockSpec((pl.Element(tx), pl.Element(Ys)), out_ix,
                              memory_space=pltpu.VMEM)] * nf \
        + [pl.BlockSpec((pl.Element(8), pl.Element(128)),
                        lambda *a: (0, 0), memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((Xs, Ys), jnp.float32)] * nf \
        + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]
    scratch = [pltpu.VMEM((Xs, Ys), jnp.float32)] * nf \
        + [pltpu.VMEM((M, Ys), jnp.float32) for _ in range(nf)] \
        + [pltpu.VMEM((8, 128), jnp.float32)]

    extra = {}
    if not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes or 120 * 1024 * 1024)
    call = pl.pallas_call(
        kernel,
        grid=(nsteps + 2, NT),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        **extra,
    )

    z_m = jnp.zeros((M, Ys), jnp.float32)

    def step(*fields):
        res = call(*fields, *args)
        # compiled mode never writes the margin rows of the outputs
        # (pinned out windows cover interior rows only): re-ground them
        # to the land zeros every caller expects instead of leaving
        # undefined HBM bytes for the next window's t=0 load
        outs = tuple(
            f.at[:M].set(z_m).at[M + lay.X:].set(z_m) for f in res[:-1])
        return outs, res[-1]

    return step


def build_fused_sw_step(lay: FusedLayout, lu_s, hhq_rest_s, metrics_profile,
                        tau: float, time_smooth: float, ffs: int,
                        trans: int, ksw: int, mu_const: float = 0.0,
                        n_tracers: int = 0, interpret: bool = False,
                        vmem_limit_bytes: int | None = None,
                        metrics_2d: bool = False,
                        rslu_planes=None, steps_per_call: int = 1,
                        tile_guard: bool = False,
                        guard_y_margin: bool = False,
                        ty: int | None = None, my: int = 128,
                        hr_const: float | None = None,
                        stacked: bool = False, rcp_div: bool = False,
                        alias_io: bool = False,
                        resident_planes: bool = False,
                        elide_sel: bool = False, q4: bool = False,
                        share_prev: bool = False, fast2d: bool = False,
                        met_map: dict | None = None, n_met: int = 16,
                        lane_offsets=None, lane_w: int | None = None):
    """Returns the fused step on fused-layout arrays; each call advances
    ``steps_per_call`` model steps (see module docstring). Every step
    function returns ``(fields_tuple, tile_max)`` where ``tile_max`` is
    the (n_tiles,) per-tile running max of |ssh| across ALL chained
    steps — the per-step stability guard (check_ssh_err_kernel,
    vel_ssh.f90:40-67), reduced in-VMEM so it costs no extra HBM pass.
    ``guard_y_margin``: the layout has wet y-margins (2D-sharded driver)
    whose wrap-contaminated lanes must be excluded from the reduction.

    With ``lu_s`` given: ``step(ssh, sshp, u, up, v, vp, *tracers)`` where
    tracers = ff_0, ffp_0, ff_1, ... With ``lu_s=None``: the raw form
    ``step(lu, hr, met, ssh, ...)`` for the sharded driver.

    ``metrics_profile``: (N_PROF, Ys) float32 rows =
    [dx, dy, dxt, dyt, dxh, dyh, dxb, dyb, rlh_s, <derived>] latitude
    profiles (x-uniform metrics), or with ``metrics_2d=True`` the
    (16, Xs, Ys) full planes from :func:`metrics_full_from_grid` — the
    bipolar / curvilinear-grid path (grid_parameters.f90:183), which
    streams 16 extra f32 planes per point per step through HBM.

    ``rslu_planes``: the (n, Xs, Ys) static planes from
    :func:`static_planes` (fast mode); in fast mode without viscosity or
    tracers the ``lu``/``hr`` arrays are not consumed by the kernel and
    are not streamed.
    """
    M = lay.margin
    tx = lay.tx
    # raw (sharded) form: rslu_planes=True means the planes arrive as a
    # runtime argument of step_raw (per-shard margined blocks)
    runtime_planes = rslu_planes is True
    static_rslu = rslu_planes is not None and rslu_planes is not False
    fast = static_rslu and (not metrics_2d or fast2d)
    visc = bool(ksw and mu_const != 0.0)
    has_lu = not fast
    has_hr = (not fast) or visc or (n_tracers > 0)
    if lu_s is None:
        has_lu = has_hr = True      # raw (sharded) form keeps both
    # 2D (x, y) tiling: ty splits the lane extent into n_ty output tiles
    # of ty lanes with my-lane margins (lay.Ys == 2*my + n_ty*ty); the
    # per-tile wet guard then elides land at (tx x ty) granularity — the
    # shard-level form of the reference's weight-0 block drop
    # (decomposition.f90:505-578) in BOTH axes.
    n_ty = 1
    if ty is not None:
        # Mosaic write windows need 128-aligned lane offsets (my + j*ty)
        assert my % 128 == 0 and ty % 128 == 0, (ty, my)
        assert (lay.Ys - 2 * my) % ty == 0, (lay.Ys, ty, my)
        n_ty = (lay.Ys - 2 * my) // ty
    ys_win = lay.Ys if ty is None else ty + 2 * my
    # Dynamic per-tile lane windows (round 5): each x-strip tile reads
    # and writes windows at a 128-aligned lane offset covering its wet
    # span plus an 8-lane land buffer (the 2-chained-step roll-wrap
    # reach) — on coastline masks the common width lane_w < Ys skips
    # the all-land lanes outside every span. Offsets ride as a scalar-
    # prefetch array; OUT windows cover only [off, off+W), so alias_io
    # is REQUIRED (unwritten lanes persist as the carried land zeros).
    lane = lane_offsets is not None
    if lane:
        assert ty is None and not stacked and not resident_planes, \
            "lane windows: x-strip, per-field, streamed-plane form only"
        assert alias_io, "lane windows need alias_io (unwritten lanes)"
        assert lane_w is not None and lane_w % 128 == 0
        ys_win = int(lane_w)
    hrc = hr_const if (hr_const is not None and ffs and fast) else None
    if stacked:
        assert lu_s is not None and ty is None, \
            "stacked form: unsharded driver, x-strip tiling only"
    n_pl_k = (len(plane_names(ffs, ksw, mu_const, metrics_2d,
                              hr_const=hrc, fast2d=fast2d))
              if static_rslu else 0)
    if resident_planes:
        assert static_rslu and ty is None and not stacked \
            and not runtime_planes, \
            "resident planes: fast x-strip non-raw form only"
    kern = _make_kernel(lay, tau, time_smooth, ffs, trans, ksw, mu_const,
                        n_tracers, metrics_2d=metrics_2d,
                        static_rslu=static_rslu,
                        steps_per_call=steps_per_call,
                        has_lu=has_lu, has_hr=has_hr,
                        tile_guard=tile_guard, hr_const=hr_const,
                        guard_col=(M if guard_y_margin else
                                   (my if ty is not None else 0)),
                        ys_win=ys_win, n_ty=n_ty,
                        out_col_crop=(my if ty is not None else 0),
                        stacked=stacked, rcp_div=rcp_div,
                        resident_planes=resident_planes, n_pl=n_pl_k,
                        elide_sel=elide_sel, q4=q4,
                        share_prev=share_prev, fast2d=fast2d,
                        met_map=met_map)

    n_tiles = lay.X // tx

    # index_maps take (i[, j], *scalar_prefetch_refs) — the trailing *_
    # keeps them valid with and without the tile-guard scalar plane
    if ty is None:
        def xy(i, *_):
            return i, 0
    else:
        def xy(i, j, *_):
            return i, j

    def lane_off(*a):
        # this tile lane offset: dynamic (prefetched, 128-aligned) in
        # lane-window mode, the static y-tile offset otherwise
        if lane:
            return pl.multiple_of(a[1][a[0]], 128)
        return xy(*a)[1] * ty if ty else 0

    def in_spec():
        def ix(*a):
            i, j = xy(*a)
            return (pl.multiple_of(i * tx, 8), lane_off(*a))
        return pl.BlockSpec(
            (pl.Element(tx + 2 * M), pl.Element(ys_win)),
            ix, memory_space=pltpu.VMEM)

    def out_spec():
        def ix(*a):
            i, j = xy(*a)
            return (pl.multiple_of(i * tx + M, 8),
                    (my + j * ty) if ty else lane_off(*a))
        return pl.BlockSpec(
            (pl.Element(tx),
             pl.Element((ys_win if lane else lay.Ys)
                        if ty is None else ty)),
            ix, memory_space=pltpu.VMEM)

    if metrics_2d:
        met_spec = pl.BlockSpec(
            (pl.Element(n_met), pl.Element(tx + 2 * M),
             pl.Element(ys_win)),
            lambda *a: (0, pl.multiple_of(xy(*a)[0] * tx, 8),
                        lane_off(*a)),
            memory_space=pltpu.VMEM)
    else:
        met_spec = pl.BlockSpec(
            (pl.Element(N_PROF), pl.Element(ys_win)),
            lambda *a: (0, lane_off(*a)),
            memory_space=pltpu.VMEM)

    shape = jax.ShapeDtypeStruct((lay.Xs, lay.Ys), jnp.float32)
    n_out = 6 + 2 * n_tracers

    extra = {}
    if vmem_limit_bytes is not None and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes)
    if alias_io:
        # Alias every state input to its output: the out windows write
        # only interior rows, so with a SHARED buffer the margin rows
        # keep whatever the caller (margin exchange / pack zeros) put
        # there — the persistent-carry driver then needs NO per-step
        # re-grounding at all on unsharded axes. (Scalar-prefetch
        # operands count in the alias indexing.)
        off = int(lane) + int(bool(tile_guard)) + int(has_lu) \
            + int(has_hr)
        if stacked:
            extra["input_output_aliases"] = {off: 0}
        else:
            al = {off + j: j for j in range(6)}
            toff = off + 6 + 1 \
                + (n_pl_k if resident_planes else int(static_rslu))
            for t in range(2 * n_tracers):
                al[toff + t] = 6 + t
            extra["input_output_aliases"] = al
    rslu_specs = []
    if static_rslu:
        n_pl = n_pl_k
        if not runtime_planes:
            assert np.asarray(rslu_planes).shape[0] == n_pl, \
                "static planes do not match this config's plane set"
        if resident_planes:
            # full-array const-index blocks: one HBM fetch, VMEM-
            # resident for the whole grid
            rslu_specs = [pl.BlockSpec(
                (pl.Element(lay.Xs), pl.Element(lay.Ys)),
                lambda *a: (0, 0), memory_space=pltpu.VMEM)] * n_pl
        else:
            rslu_specs = [pl.BlockSpec(
                (pl.Element(n_pl), pl.Element(tx + 2 * M),
                 pl.Element(ys_win)),
                lambda *a: (0, pl.multiple_of(xy(*a)[0] * tx, 8),
                            lane_off(*a)),
                memory_space=pltpu.VMEM)]
    n_base = int(has_lu) + int(has_hr)
    n_f = 6 + 2 * n_tracers
    if stacked:
        state_spec = pl.BlockSpec(
            (pl.Element(n_f), pl.Element(tx + 2 * M),
             pl.Element(lay.Ys)),
            lambda i, *_: (0, pl.multiple_of(i * tx, 8), 0),
            memory_space=pltpu.VMEM)
        in_specs = ([in_spec() for _ in range(n_base)] + [state_spec]
                    + [met_spec] + rslu_specs)
    else:
        in_specs = ([in_spec() for _ in range(n_base + 6)] + [met_spec]
                    + rslu_specs
                    + [in_spec() for _ in range(2 * n_tracers)])
    # per-tile |ssh| max rides out as one broadcast (8, 128) VMEM block
    # per tile (4 KB/tile — noise next to the field outputs; smaller
    # blocks hit Mosaic's 8x128 block minimum, and rank-1 SMEM blocks
    # its span-the-array restriction)
    max_spec = pl.BlockSpec(
        (pl.Element(8), pl.Element(128)),
        lambda *a: (pl.multiple_of(
            (xy(*a)[0] * n_ty + xy(*a)[1]) * 8, 8), 0),
        memory_space=pltpu.VMEM)
    max_shape = jax.ShapeDtypeStruct((n_tiles * n_ty * 8, 128),
                                     jnp.float32)
    if stacked:
        out_specs = [pl.BlockSpec(
            (pl.Element(n_f), pl.Element(tx), pl.Element(lay.Ys)),
            lambda i, *_: (0, pl.multiple_of(i * tx + M, 8), 0),
            memory_space=pltpu.VMEM), max_spec]
        out_shapes = [jax.ShapeDtypeStruct((n_f, lay.Xs, lay.Ys),
                                           jnp.float32), max_shape]
    else:
        out_specs = [out_spec() for _ in range(n_out)] + [max_spec]
        out_shapes = [shape] * n_out + [max_shape]
    grid = (n_tiles,) if ty is None else (n_tiles, n_ty)
    n_pref = int(lane) + int(bool(tile_guard))
    if lane:
        # the lane-offset array is the FIRST prefetch operand; the
        # kernel body never consumes it (index maps do), so strip it
        inner_kern = kern

        def kern(off_ref, *rest):  # noqa: F811 - deliberate rebind
            inner_kern(*rest)
    if n_pref:
        # scalar-prefetch operands (lane offsets and/or per-tile wet
        # flags) ride as SMEM planes ahead of the windows
        call = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=n_pref,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs),
            out_shape=out_shapes,
            interpret=interpret,
            **extra,
        )
    else:
        call = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            **extra,
        )

    if lu_s is None:
        assert not lane, "lane windows: unsharded driver only (v1)"
        if static_rslu:
            assert runtime_planes, \
                "raw form takes planes at runtime (rslu_planes=True)"

            def step_raw(lu_a, hr_a, met_a, planes_a,
                         ssh, sshp, u, up, v, vp, *tracers,
                         tile_wet=None):
                pre = (tile_wet,) if tile_guard else ()
                res = call(*pre, lu_a, hr_a, ssh, sshp, u, up, v,
                           vp, met_a, planes_a, *tracers)
                return tuple(res[:-1]), res[-1]
            return step_raw

        def step_raw(lu_a, hr_a, met_a, ssh, sshp, u, up, v, vp, *tracers,
                     tile_wet=None):
            pre = (tile_wet,) if tile_guard else ()
            res = call(*pre, lu_a, hr_a, ssh, sshp, u, up, v, vp,
                       met_a, *tracers)
            return tuple(res[:-1]), res[-1]
        return step_raw

    base = []
    if has_lu:
        base.append(jnp.asarray(lu_s, jnp.float32))
    if has_hr:
        base.append(jnp.asarray(hhq_rest_s, jnp.float32))
    met = jnp.asarray(metrics_profile, jnp.float32)
    if static_rslu and resident_planes:
        pnp = np.asarray(rslu_planes, np.float32)
        statics = tuple(jnp.asarray(pnp[j]) for j in range(pnp.shape[0]))
    elif static_rslu:
        statics = (jnp.asarray(rslu_planes, jnp.float32),)
    else:
        statics = ()
    pre = ()
    if lane:
        pre = (jnp.asarray(lane_offsets, jnp.int32),)
    if tile_guard:
        lu_np = np.asarray(lu_s)
        if ty is None:
            tw = np.array(
                [(lu_np[M + i * tx: M + (i + 1) * tx] > 0.5).any()
                 for i in range(n_tiles)], np.int32)
        else:
            tw = np.array(
                [(lu_np[M + i * tx: M + (i + 1) * tx,
                        my + j * ty: my + (j + 1) * ty] > 0.5).any()
                 for i in range(n_tiles) for j in range(n_ty)], np.int32)
        pre = pre + (jnp.asarray(tw),)

    if stacked:
        def step_stacked(S):
            """S: (6+2T, Xs, Ys) stacked state -> (S', tile_max)."""
            res = call(*pre, *base, S, met, *statics)
            return res[0], res[1]
        return step_stacked

    def step(ssh, sshp, u, up, v, vp, *tracers):
        res = call(*pre, *base, ssh, sshp, u, up, v, vp, met,
                   *statics, *tracers)
        return tuple(res[:-1]), res[-1]

    return step


def staggered_wet_masks(lu) -> tuple:
    """(wlcu, wlcv, wlu) float32 0/1 masks from a T-point wet mask in
    any layout — the staggered-gridpoint wet sets (grid_kernels.f90:
    40-92 lcu/lcv/lu) used by the drivers' elide_sel pack masking."""
    lu_b = np.asarray(lu) > 0.5
    x1 = np.zeros_like(lu_b)
    x1[:-1] = lu_b[1:]
    y1 = np.zeros_like(lu_b)
    y1[:, :-1] = lu_b[:, 1:]
    return ((lu_b & x1).astype(np.float32),
            (lu_b & y1).astype(np.float32),
            lu_b.astype(np.float32))


def lane_windows_from_mask(lu_s, lay: FusedLayout,
                           steps_per_call: int) -> tuple:
    """Per-tile 128-aligned lane-window offsets + the common window
    width for the dynamic lane-window mode: each x-strip tile's window
    must cover its rows' wet lane span plus a land buffer of the
    per-step roll-wrap reach (4 cells; each chained step re-grounds
    land through its output selects, so the reach does NOT accumulate —
    8 is used as margin-of-safety parity with the x margins). Returns
    ``(offsets[int32 n_tiles], W)`` with W a multiple of 128; W ==
    lay.Ys means no lane can be skipped on this mask."""
    M, tx, Ys = lay.margin, lay.tx, lay.Ys
    n_tiles = lay.X // tx
    buf = 8
    lu = np.asarray(lu_s) > 0.5
    need = []
    for i in range(n_tiles):
        rows = lu[i * tx: i * tx + tx + 2 * M]
        cols = np.where(rows.any(axis=0))[0]
        if cols.size == 0:
            need.append(None)
            continue
        need.append((max(int(cols[0]) - buf, 0),
                     min(int(cols[-1]) + buf, Ys - 1)))
    W = 128
    for nd in need:
        if nd is None:
            continue
        lo, hi = nd
        W = max(W, hi - (lo // 128) * 128 + 1)
    W = min(-(-W // 128) * 128, Ys)
    offs = np.zeros(n_tiles, np.int32)
    for i, nd in enumerate(need):
        if nd is None:
            continue
        offs[i] = min((nd[0] // 128) * 128, Ys - W)
    return offs, int(W)


def metrics_profile_from_grid(grid, lay: FusedLayout) -> np.ndarray:
    """Extract the (N_PROF, Ys) latitude profiles from a Grid; raises if
    any metric is not x-uniform (then use the jnp path)."""
    rows = np.zeros((N_PROF, lay.Ys), np.float32)
    names = ["dx", "dy", "dxt", "dyt", "dxh", "dyh", "dxb", "dyb", "rlh_s"]
    for k, name in enumerate(names):
        f = np.asarray(getattr(grid, name))
        if not np.allclose(f, f[:1, :], rtol=0, atol=0):
            raise ValueError(f"metric {name} is not x-uniform; "
                             "fused path unsupported (use jnp step)")
        yp = lay.ypad
        rows[k, yp:yp + lay.ny] = f[0, :]
        # extend profiles into the y land margin so divisions stay finite
        rows[k, :yp] = f[0, 0]
        rows[k, yp + lay.ny:] = f[0, -1]
    # rows 9-15: reciprocal profiles (see kernel) — metric divisions
    # become multiplies on the VPU
    with np.errstate(divide="ignore"):
        rows[9] = np.float32(1.0) / (rows[0] * rows[1])   # 1/(dx*dy)
        for k, src in ((10, 2), (11, 3), (12, 4), (13, 5), (14, 6),
                       (15, 7)):
            rows[k] = np.float32(1.0) / rows[src]
        # rows 16-21 (fast mode): vorticity metric differences (carrying
        # the advection 1/4 so vort/H2/M2 arrive pre-scaled and merge
        # with the MT21-folded Coriolis terms), stress ratios, and the
        # 0.25-folded Coriolis product
        rows[16] = (rows[3] - rows[7]) * np.float32(0.25)  # (dyt-dyb)/4
        rows[17] = (np.concatenate([rows[2][1:], rows[2][-1:]])
                    - rows[6]) * np.float32(0.25)
        rows[18] = (rows[2] - rows[6]) * np.float32(0.25)  # (dxt-dxb)/4
        rows[19] = rows[1] / rows[0]                      # dy/dx
        rows[20] = rows[0] / rows[1]                      # dx/dy
        rows[21] = rows[8] * rows[6] * rows[7] * np.float32(0.25)
    bad = ~np.isfinite(rows[9:])
    rows[9:][bad] = 0.0
    return rows


def static_planes(lu_s: np.ndarray, hr_s: np.ndarray, dxdy: np.ndarray,
                  names: tuple, interp_recips=None) -> np.ndarray:
    """(len(names), Xs, Ys) static planes, pure functions of the land
    mask / bathymetry / metrics — see :func:`plane_names`. Precomputing
    them removes the per-step mask/select recomputes and the aq
    metric/gating muls from the hot loop.
    ``dxdy``: (Xs, Ys) full plane or (1, Ys) y-profile row.
    ``interp_recips``: fast mode only — ((1,Ys) rows 1/dxt, 1/dyt,
    1/(dxb*dyb)) folded into the rslu planes so each depth interpolation
    costs one multiply instead of two."""
    lu = np.asarray(lu_s, np.float32)
    x1 = np.zeros_like(lu)
    x1[:-1, :] = lu[1:, :]          # lu[i+1, j]
    y1 = np.zeros_like(lu)
    y1[:, :-1] = lu[:, 1:]          # lu[i, j+1]
    xy1 = np.zeros_like(lu)
    xy1[:-1, :-1] = lu[1:, 1:]      # lu[i+1, j+1]

    def recip(s):
        return np.float32(1.0) / np.maximum(s, 1.0)

    if interp_recips is not None:
        r_u, r_v, r_h = (np.asarray(r, np.float32) for r in interp_recips)
    else:
        r_u = r_v = r_h = np.float32(1.0)

    ludxdy = (lu * np.asarray(dxdy, np.float32)).astype(np.float32)
    if "ludxdy" in names:
        wet = ludxdy[lu > 0.5]
        assert wet.size == 0 or wet.min() > 0.5, \
            "dx*dy too small for ludxdy to double as the wlu mask"
    build = {
        "rslu_u": lambda: recip(lu + x1) * r_u,
        "rslu_v": lambda: recip(lu + y1) * r_v,
        "rslu_h": lambda: recip(lu + x1 + y1 + xy1) * r_h,
        "wlu": lambda: lu,
        "wlcu": lambda: lu * x1,
        "wlcv": lambda: lu * y1,
        "wluu": lambda: lu * x1 * y1 * xy1,
        "ludxdy": lambda: ludxdy,
        "hrludxdy": lambda: (np.asarray(hr_s, np.float32)
                             * ludxdy).astype(np.float32),
    }
    return np.stack([build[n]() for n in names]).astype(np.float32)


def fast2d_met_rows(trans: int, visc: bool, n_tracers: int) -> tuple:
    """Metric-plane rows the FAST kernel consumes for a config — the
    2D-metrics fast path streams only these (a pruned stack instead of
    all 16/22 planes). Row meanings match
    :func:`metrics_profile_from_grid`."""
    rows = {9, 10, 11, 21}
    if trans:
        rows |= {14, 15, 16, 17, 18}
    if visc:
        rows |= {0, 1, 6, 7, 12, 13, 14, 15, 19, 20}
    if n_tracers:
        rows |= {0, 1}
    return tuple(sorted(rows))


def metrics_full_from_grid(grid, lay: FusedLayout,
                           derived: bool = False) -> np.ndarray:
    """(16, Xs, Ys) full metric planes for the 2D-metrics fused path
    (bipolar / curvilinear grids, grid_parameters.f90:183 — metrics vary
    in both directions). Margins are edge-replicated so reciprocals stay
    finite; plane order matches :func:`metrics_profile_from_grid`.
    ``derived=True`` (the fast-2D path) appends rows 16-21 — the
    vorticity metric differences, stress ratios, and 0.25-folded
    Coriolis product — computed pointwise exactly as the profile builder
    does per latitude."""
    M = lay.margin
    n = 22 if derived else 16
    planes = np.zeros((n, lay.Xs, lay.Ys), np.float32)
    names = ["dx", "dy", "dxt", "dyt", "dxh", "dyh", "dxb", "dyb", "rlh_s"]
    for k, name in enumerate(names):
        f = np.asarray(getattr(grid, name), np.float32)
        p = planes[k]
        yp = lay.ypad
        p[M:M + lay.nx, yp:yp + lay.ny] = f
        # edge-replicate into the margins (y first, then x rows cover
        # the corners too)
        p[M:M + lay.nx, :yp] = f[:, :1]
        p[M:M + lay.nx, yp + lay.ny:] = f[:, -1:]
        p[:M, :] = p[M, :]
        p[M + lay.nx:, :] = p[M + lay.nx - 1, :]
    with np.errstate(divide="ignore"):
        planes[9] = np.float32(1.0) / (planes[0] * planes[1])
        for k, src in ((10, 2), (11, 3), (12, 4), (13, 5), (14, 6),
                       (15, 7)):
            planes[k] = np.float32(1.0) / planes[src]
        if derived:
            planes[16] = (planes[3] - planes[7]) * np.float32(0.25)
            dxt_n1 = np.concatenate(
                [planes[2][:, 1:], planes[2][:, -1:]], axis=1)
            planes[17] = (dxt_n1 - planes[6]) * np.float32(0.25)
            planes[18] = (planes[2] - planes[6]) * np.float32(0.25)
            planes[19] = planes[1] / planes[0]
            planes[20] = planes[0] / planes[1]
            planes[21] = planes[8] * planes[6] * planes[7] \
                * np.float32(0.25)
    planes[9:][~np.isfinite(planes[9:])] = 0.0
    return planes
