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

2. **The whole step fuses.** The total stencil reach of one step
   (including the tracer pass, which consumes post-rotation velocities
   and post-hh_init depths) is <= 8 cells, so a tile with an 8-cell
   x-halo computes the entire update_ssh -> hh_update -> vort ->
   uv_trans -> stress -> uv_diff2 -> update_uv -> next_step ->
   [tracer fluxes -> update -> filter] chain for its interior in one
   pass: (6 + 2T) prognostic reads + 2 static reads + (6 + 2T) writes
   per point per step (T = number of tracers).

Layout: arrays are (Xs, Ys) float32 where Xs = margin + X + margin
(margin = 8 rows of land so halo windows never leave the array — Mosaic
element windows reject low padding) and Ys = ny + 4 extra land columns
(y-shifts are lane rolls; wrapped values land on land cells only).
Tiles are x-strips: Element windows (TX + 16, Ys) overlapping by the
margin, outputs (TX, Ys) disjoint. Metric fields must be x-uniform
(regular x spacing — true for every reference config with xgr_type=0);
they ride as (16, Ys) latitude profiles broadcast across rows.

Restrictions vs the jnp path (which remains the general fallback):
non-periodic boundaries, x-uniform metrics, spatially-constant mu,
r_diss = 0 (the reference never writes it, core/data_types zero-init).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.constants import FREE_FALL_ACC

MARGIN = 8          # x margin rows (= max halo; 8-aligned window starts)
# Kernel graph mode. False (default): per-stage halo shaving via x-slices —
# fastest runtime (0.217 ms/step on the 1525x1115 config) but the shape
# diversity makes Mosaic compiles take minutes (one-time, persistently
# cached). True: every stage at the full window with roll-shifts — compiles
# in seconds but sublane rolls cost ~2.5x runtime. Flip for fast iteration.
UNIFORM_SHAPES = False
YPAD = 2            # extra land columns each side in y


class FusedLayout(NamedTuple):
    nx: int          # physical extents
    ny: int
    X: int           # domain rows (multiple of tile)
    Xs: int          # stored rows = X + 2*MARGIN
    Ys: int          # stored cols = ny + 2*YPAD
    tx: int          # tile rows


def make_layout(nx: int, ny: int, tx: int = 64) -> FusedLayout:
    X = -(-nx // tx) * tx
    return FusedLayout(nx, ny, X, X + 2 * MARGIN, ny + 2 * YPAD, tx)


def embed(lay: FusedLayout, a) -> jnp.ndarray:
    """Place an (nx, ny) field into the fused (Xs, Ys) layout (zeros
    elsewhere — land)."""
    out = jnp.zeros((lay.Xs, lay.Ys), jnp.float32)
    return out.at[MARGIN:MARGIN + lay.nx,
                  YPAD:YPAD + lay.ny].set(jnp.asarray(a, jnp.float32))


def extract(lay: FusedLayout, a) -> jnp.ndarray:
    """Crop back to the physical (nx, ny) extents."""
    return a[MARGIN:MARGIN + lay.nx, YPAD:YPAD + lay.ny]


def _roll_y(a, dn: int, ys: int):
    """result[m, n] = a[m, n + dn] (lane roll; wrap hits land columns)."""
    if dn == 0:
        return a
    return pltpu.roll(a, (-dn) % ys, 1)


def _make_kernel(lay: FusedLayout, tau: float, time_smooth: float,
                 ffs: int, trans: int, ksw: int, mu_const: float,
                 n_tracers: int = 0):
    M = MARGIN
    Ys = lay.Ys
    g = float(FREE_FALL_ACC)
    ts = float(time_smooth)
    visc = bool(ksw and mu_const != 0.0)

    uniform = UNIFORM_SHAPES

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

        def fin(x):
            """Final output view: drop the margins in uniform mode."""
            return x[M:-M, :] if uniform else x

        (lu_ref, hr_ref, ssh_ref, sshp_ref, u_ref, up_ref, v_ref,
         vp_ref, met_ref) = refs[:9]
        tr_refs = refs[9:9 + 2 * n_tracers]          # ff_i, ffp_i pairs
        outs = refs[9 + 2 * n_tracers:]
        (ssh_o, sshp_o, u_o, up_o, v_o, vp_o) = outs[:6]
        tr_outs = outs[6:]                           # ff_i, ffp_i pairs

        lu8 = lu_ref[...]
        hr8 = hr_ref[...]
        ssh8 = ssh_ref[...]
        sshp8 = sshp_ref[...]
        u8 = u_ref[...]
        up8 = up_ref[...]
        v8 = v_ref[...]
        vp8 = vp_ref[...]
        met = met_ref[...]      # (16, Ys) latitude profiles

        def mrow(k):
            return met[k:k + 1, :]

        dx, dy = mrow(0), mrow(1)
        dxt, dyt = mrow(2), mrow(3)
        dxh, dyh = mrow(4), mrow(5)
        dxb, dyb = mrow(6), mrow(7)
        rlh_s = mrow(8)
        # reciprocal profiles (divisions are the dominant VPU cost of the
        # interpolation/update chains; one recip per metric per row is
        # precomputed host-side)
        rsq = mrow(9)              # 1/(dx*dy)
        rdxt, rdyt = mrow(10), mrow(11)
        rdxh, rdyh = mrow(12), mrow(13)
        rdxb, rdyb = mrow(14), mrow(15)
        inv2tau = float(1.0 / (2.0 * tau))

        def LU(h, dm=0, dn=0):
            return sl(lu8, M, h, dm, dn)

        def WLCU(h):
            return (LU(h) * LU(h, 1, 0)) > 0.5

        def WLCV(h):
            return (LU(h) * LU(h, 0, 1)) > 0.5

        def WLUU(h):
            return (LU(h) * LU(h, 1, 0) * LU(h, 0, 1) * LU(h, 1, 1)) > 0.5

        # ---- depth interpolations (hh_init/hh_update, depth.f90) ----
        # hq = h_r + ssh*ffs on T; area-weighted onto U/V/H points. The
        # weighted column aq = hq*dx*dy*lu is shared by all three interps.
        def interp_u(h, aq0):
            """aq0 must carry halo h+1. slu in {0,1,2}: the reciprocal is
            an exact select, no division."""
            slu = LU(h) + LU(h, 1, 0)
            w = slu > 0.5
            rslu = jnp.where(slu > 1.5, 0.5, 1.0)
            return jnp.where(
                w, (sl(aq0, h + 1, h) + sl(aq0, h + 1, h, 1, 0))
                * rslu * (rdxt * rdyh), 0.0)

        def interp_v(h, aq0):
            slu = LU(h) + LU(h, 0, 1)
            w = slu > 0.5
            rslu = jnp.where(slu > 1.5, 0.5, 1.0)
            return jnp.where(
                w, (sl(aq0, h + 1, h) + sl(aq0, h + 1, h, 0, 1))
                * rslu * (rdxh * rdyt), 0.0)

        def interp_h(h, aq0):
            q = [sl(aq0, h + 1, h, a, b)
                 for (a, b) in ((0, 0), (1, 0), (0, 1), (1, 1))]
            slu = (LU(h) + LU(h, 1, 0) + LU(h, 0, 1) + LU(h, 1, 1))
            w = slu > 0.5
            # slu in {0..4}; select the reciprocal (1/3 rounds once, same
            # as the division up to 1 ulp)
            rslu = jnp.where(
                slu > 3.5, 0.25,
                jnp.where(slu > 2.5, np.float32(1.0 / 3.0),
                          jnp.where(slu > 1.5, 0.5, 1.0)))
            return jnp.where(
                w, (q[0] + q[1] + q[2] + q[3])
                * rslu * (rdxb * rdyb), 0.0)

        def aq_of(h, src):
            hq = sl(hr8, M, h) + sl(src, M, h) * float(ffs)
            return hq * dx * dy * LU(h)

        # current-level depths (== new-level: hqn = h_r + ssh = hq);
        # halo 3 so the deeper chains below stay in budget
        aq_cur4 = aq_of(4, ssh8)
        hu3 = interp_u(3, aq_cur4)
        hv3 = interp_v(3, aq_cur4)
        hh3 = interp_h(3, aq_cur4)
        # previous-level depths (pointwise consumers in update_uv)
        aq_prev2 = aq_of(2, sshp8)
        hup1 = interp_u(1, aq_prev2)
        hvp1 = interp_v(1, aq_prev2)

        # ---- continuity: sshn at halo 2 (sw_update_ssh_kernel) ----
        uflux3 = sl(u8, M, 3) * hu3 * dyh
        vflux3 = sl(v8, M, 3) * hv3 * dxh
        wlu2 = LU(2) > 0.5
        div2 = (sl(uflux3, 3, 2) - sl(uflux3, 3, 2, -1, 0)
                + sl(vflux3, 3, 2) - sl(vflux3, 3, 2, 0, -1)) * rsq
        sshn2 = jnp.where(wlu2, sl(sshp8, M, 2) + 2.0 * tau * (-div2), 0.0)

        # ---- momentum advection (uv_trans_vort + uv_trans) ----
        if trans:
            wluu2 = WLUU(2)
            vd_t = sl(v8, M, 3) * dyt          # v*dyt at h3
            ud_t = sl(u8, M, 3) * dxt
            vort2 = jnp.where(
                wluu2,
                (sl(vd_t, 3, 2, 1, 0) - sl(vd_t, 3, 2))
                - (sl(ud_t, 3, 2, 0, 1) - sl(ud_t, 3, 2))
                - ((sl(v8, M, 2, 1, 0) - sl(v8, M, 2)) * dyb
                   - (sl(u8, M, 2, 0, 1) - sl(u8, M, 2)) * dxb), 0.0)

            ud3 = sl(u8, M, 3) * dyh * hu3     # u*dyh*hu at h3
            vd3 = sl(v8, M, 3) * dxh * hv3
            vorth2 = vort2 * sl(hh3, 3, 2)
            luu2f = jnp.where(wluu2, 1.0, 0.0)
            u_c = sl(u8, M, 2)
            v_c = sl(v8, M, 2)

            fx_p = (sl(ud3, 3, 1) + sl(ud3, 3, 1, 1, 0)) / 2.0 \
                * (sl(u_c, 2, 1) + sl(u_c, 2, 1, 1, 0)) / 2.0
            fx_m = (sl(ud3, 3, 1) + sl(ud3, 3, 1, -1, 0)) / 2.0 \
                * (sl(u_c, 2, 1) + sl(u_c, 2, 1, -1, 0)) / 2.0
            fy_p = (sl(vd3, 3, 1) + sl(vd3, 3, 1, 1, 0)) / 2.0 \
                * (sl(u_c, 2, 1, 0, 1) + sl(u_c, 2, 1)) / 2.0 \
                * sl(luu2f, 2, 1)
            fy_m = (sl(vd3, 3, 1, 0, -1) + sl(vd3, 3, 1, 1, -1)) / 2.0 \
                * (sl(u_c, 2, 1, 0, -1) + sl(u_c, 2, 1)) / 2.0 \
                * sl(luu2f, 2, 1, 0, -1)
            rx_adv1 = jnp.where(
                WLCU(1),
                -(fx_p - fx_m + fy_p - fy_m)
                + (sl(vorth2, 2, 1) * (sl(v_c, 2, 1, 1, 0) + sl(v_c, 2, 1))
                   + sl(vorth2, 2, 1, 0, -1)
                   * (sl(v_c, 2, 1, 1, -1) + sl(v_c, 2, 1, 0, -1))) / 4.0,
                0.0)

            gy_p = (sl(vd3, 3, 1) + sl(vd3, 3, 1, 0, 1)) / 2.0 \
                * (sl(v_c, 2, 1) + sl(v_c, 2, 1, 0, 1)) / 2.0
            gy_m = (sl(vd3, 3, 1) + sl(vd3, 3, 1, 0, -1)) / 2.0 \
                * (sl(v_c, 2, 1) + sl(v_c, 2, 1, 0, -1)) / 2.0
            gx_p = (sl(ud3, 3, 1) + sl(ud3, 3, 1, 0, 1)) / 2.0 \
                * (sl(v_c, 2, 1, 1, 0) + sl(v_c, 2, 1)) / 2.0
            gx_m = (sl(ud3, 3, 1, -1, 0) + sl(ud3, 3, 1, -1, 1)) / 2.0 \
                * (sl(v_c, 2, 1, -1, 0) + sl(v_c, 2, 1)) / 2.0
            ry_adv1 = jnp.where(
                WLCV(1),
                -(gx_p - gx_m + gy_p - gy_m)
                - (sl(vorth2, 2, 1) * (sl(u_c, 2, 1, 0, 1) + sl(u_c, 2, 1))
                   + sl(vorth2, 2, 1, -1, 0)
                   * (sl(u_c, 2, 1, -1, 1) + sl(u_c, 2, 1, -1, 0))) / 4.0,
                0.0)
        else:
            rx_adv1 = 0.0
            ry_adv1 = 0.0

        # ---- lateral viscosity (stress_components + uv_diff2) ----
        if visc:
            q3 = sl(up8, M, 3) / dyh
            r3 = sl(vp8, M, 3) / dxh
            str_t2 = jnp.where(
                LU(2) > 0.5,
                dy / dx * (sl(q3, 3, 2) - sl(q3, 3, 2, -1, 0))
                - dx / dy * (sl(r3, 3, 2) - sl(r3, 3, 2, 0, -1)), 0.0)
            s1 = sl(up8, M, 3) / dxt
            s2 = sl(vp8, M, 3) / dyt
            str_s2 = jnp.where(
                WLUU(2),
                dxb / dyb * (sl(s1, 3, 2, 0, 1) - sl(s1, 3, 2))
                + dyb / dxb * (sl(s2, 3, 2, 1, 0) - sl(s2, 3, 2)), 0.0)

            hq2 = sl(hr8, M, 2) + sl(ssh8, M, 2) * float(ffs)
            a2 = (dy * dy) * mu_const * hq2 * str_t2
            b2 = (dx * dx) * mu_const * hq2 * str_t2
            rx_dif1 = jnp.where(
                WLCU(1),
                (sl(a2, 2, 1, 1, 0) - sl(a2, 2, 1)) / dyh
                + (dxb * dxb * mu_const * sl(hh3, 3, 1) * sl(str_s2, 2, 1)
                   - _roll_y(dxb * dxb, -1, Ys) * mu_const
                   * sl(hh3, 3, 1, 0, -1) * sl(str_s2, 2, 1, 0, -1)) / dxt,
                0.0)
            ry_dif1 = jnp.where(
                WLCV(1),
                -(sl(b2, 2, 1, 0, 1) - sl(b2, 2, 1)) / dxh
                + (dyb * dyb * mu_const * sl(hh3, 3, 1) * sl(str_s2, 2, 1)
                   - dyb * dyb * mu_const
                   * sl(hh3, 3, 1, -1, 0) * sl(str_s2, 2, 1, -1, 0)) / dyt,
                0.0)
        else:
            rx_dif1 = 0.0
            ry_dif1 = 0.0

        # ---- momentum update at halo 1 (sw_update_uv) ----
        wlcu1 = WLCU(1)
        wlcv1 = WLCV(1)
        hu1 = sl(hu3, 3, 1)
        hv1 = sl(hv3, 3, 1)
        corio2 = rlh_s * sl(hh3, 3, 2) * dxb * dyb
        ssh_c2 = sl(ssh8, M, 2)
        u_c2 = sl(u8, M, 2)
        v_c2 = sl(v8, M, 2)
        up1 = sl(up8, M, 1)
        vp1 = sl(vp8, M, 1)

        bp_u = hu1 * dxt * dyh * inv2tau   # hhun == hhu (see docstring)
        bp0_u = hup1 * dxt * dyh * inv2tau
        slx = -g * (sl(ssh_c2, 2, 1, 1, 0) - sl(ssh_c2, 2, 1)) * dyh * hu1
        grx = (slx + rx_dif1 + rx_adv1
               + (sl(corio2, 2, 1) * (sl(v_c2, 2, 1, 1, 0) + sl(v_c2, 2, 1))
                  + sl(corio2, 2, 1, 0, -1)
                  * (sl(v_c2, 2, 1, 1, -1) + sl(v_c2, 2, 1, 0, -1))) / 4.0)
        un1 = jnp.where(
            wlcu1, (up1 * bp0_u + grx) / jnp.where(wlcu1, bp_u, 1.0), 0.0)

        bp_v = hv1 * dyt * dxh * inv2tau
        bp0_v = hvp1 * dyt * dxh * inv2tau
        sly = -g * (sl(ssh_c2, 2, 1, 0, 1) - sl(ssh_c2, 2, 1)) * dxh * hv1
        gry = (sly + ry_dif1 + ry_adv1
               - (sl(corio2, 2, 1) * (sl(u_c2, 2, 1, 0, 1) + sl(u_c2, 2, 1))
                  + sl(corio2, 2, 1, -1, 0)
                  * (sl(u_c2, 2, 1, -1, 1) + sl(u_c2, 2, 1, -1, 0))) / 4.0)
        vn1 = jnp.where(
            wlcv1, (vp1 * bp0_v + gry) / jnp.where(wlcv1, bp_v, 1.0), 0.0)

        # ---- leapfrog rotation + Robert-Asselin filter (sw_next_step) ----
        wlu0 = LU(0) > 0.5
        wlcu0 = WLCU(0)
        wlcv0 = WLCV(0)
        ssh0 = sl(ssh8, M, 0)
        sshp0 = sl(sshp8, M, 0)
        u0 = sl(u8, M, 0)
        v0 = sl(v8, M, 0)
        sshn0 = sl(sshn2, 2, 0)
        un0 = sl(un1, 1, 0)
        vn0 = sl(vn1, 1, 0)
        up0 = sl(up8, M, 0)
        vp0 = sl(vp8, M, 0)

        ssh_new0 = jnp.where(wlu0, sshn0, ssh0)
        sshp_new0 = jnp.where(
            wlu0, ssh0 + ts * (sshn0 - 2.0 * ssh0 + sshp0) / 2.0, sshp0)
        ssh_o[...] = fin(ssh_new0)
        sshp_o[...] = fin(sshp_new0)
        u_o[...] = fin(jnp.where(wlcu0, un0, u0))
        up_o[...] = fin(jnp.where(
            wlcu0, u0 + ts * (un0 - 2.0 * u0 + up0) / 2.0, up0))
        v_o[...] = fin(jnp.where(wlcv0, vn0, v0))
        vp_o[...] = fin(jnp.where(
            wlcv0, v0 + ts * (vn0 - 2.0 * v0 + vp0) / 2.0, vp0))

        # ---- tracer pass (expl_tracer, runs after the SW step) ----
        if n_tracers:
            # post-step depths: hh_init from the NEW (ssh, sshp) sets
            # hhu = interp(h_r + ssh_new), hhq_n = h_r,
            # hhq_p = h_r + sshp_new (tracer_interface.f90 bindings)
            ssh_new2 = jnp.where(LU(2) > 0.5, sshn2, sl(ssh8, M, 2))
            aq_new2 = (sl(hr8, M, 2) + ssh_new2 * float(ffs)) \
                * dx * dy * LU(2)
            hun1 = interp_u(1, aq_new2)
            hvn1 = interp_v(1, aq_new2)
            u_new1 = jnp.where(WLCU(1), un1, sl(u8, M, 1))
            v_new1 = jnp.where(WLCV(1), vn1, sl(v8, M, 1))

            wlcu1t = WLCU(1)
            wlcv1t = WLCV(1)
            for t in range(n_tracers):
                ff8 = tr_refs[2 * t][...]
                ffp8 = tr_refs[2 * t + 1][...]
                ff_o = tr_outs[2 * t]
                ffp_o = tr_outs[2 * t + 1]

                ff2 = sl(ff8, M, 2)
                # fluxes (tran_diff_fluxes_kernel): advective + diffusive
                dfdx = sl(ff2, 2, 1, 1, 0) - sl(ff2, 2, 1)
                mu_x = mu_const * dyh * rdxt   # (mu+mu)/2 * factor(=1)
                fx1 = jnp.where(
                    wlcu1t,
                    -u_new1 * hun1 * dyh
                    * (sl(ff2, 2, 1) + sl(ff2, 2, 1, 1, 0)) / 2.0
                    + mu_x * hun1 * dfdx, 0.0)
                dfdy = sl(ff2, 2, 1, 0, 1) - sl(ff2, 2, 1)
                mu_y = mu_const * dxh * rdyt
                fy1 = jnp.where(
                    wlcv1t,
                    -v_new1 * hvn1 * dxh
                    * (sl(ff2, 2, 1) + sl(ff2, 2, 1, 0, 1)) / 2.0
                    + mu_y * hvn1 * dfdy, 0.0)

                # leapfrog update (tran_diff_tracer_kernel):
                # bp = hhq_n*area/2tau with hhq_n = h_r,
                # bp0 with hhq_p = h_r + sshp_new*ffs
                hr0 = sl(hr8, M, 0)
                bp = hr0 * dx * dy * inv2tau
                bp0 = (hr0 + sshp_new0 * float(ffs)) \
                    * dx * dy * inv2tau
                rhs = (sl(fx1, 1, 0) - sl(fx1, 1, 0, -1, 0)
                       + sl(fy1, 1, 0) - sl(fy1, 1, 0, 0, -1))
                ffp0 = sl(ffp8, M, 0)
                ff0 = sl(ff8, M, 0)
                ffn0 = jnp.where(
                    wlu0, (bp0 * ffp0 + rhs) / jnp.where(wlu0, bp, 1.0),
                    0.0)
                # filter + rotation (tracer_next_step_kernel)
                ff_o[...] = fin(jnp.where(wlu0, ffn0, ff0))
                ffp_o[...] = fin(jnp.where(
                    wlu0, ff0 + ts * (ffn0 - 2.0 * ff0 + ffp0) / 2.0,
                    ffp0))

    return kernel


def build_fused_sw_step(lay: FusedLayout, lu_s, hhq_rest_s, metrics_profile,
                        tau: float, time_smooth: float, ffs: int,
                        trans: int, ksw: int, mu_const: float = 0.0,
                        n_tracers: int = 0, interpret: bool = False,
                        vmem_limit_bytes: int | None = None):
    """Returns the fused step on fused-layout arrays.

    With ``lu_s`` given: ``step(ssh, sshp, u, up, v, vp, *tracers)`` where
    tracers = ff_0, ffp_0, ff_1, ... With ``lu_s=None``: the raw form
    ``step(lu, hr, met, ssh, ...)`` for the sharded driver.

    ``metrics_profile``: (16, Ys) float32 rows =
    [dx, dy, dxt, dyt, dxh, dyh, dxb, dyb, rlh_s, 0...] latitude profiles.
    """
    M = MARGIN
    tx = lay.tx
    kern = _make_kernel(lay, tau, time_smooth, ffs, trans, ksw, mu_const,
                        n_tracers)

    n_tiles = lay.X // tx

    def in_spec():
        return pl.BlockSpec(
            (pl.Element(tx + 2 * M), pl.Element(lay.Ys)),
            lambda i: (pl.multiple_of(i * tx, 8), 0),
            memory_space=pltpu.VMEM)

    def out_spec():
        return pl.BlockSpec(
            (pl.Element(tx), pl.Element(lay.Ys)),
            lambda i: (pl.multiple_of(i * tx + M, 8), 0),
            memory_space=pltpu.VMEM)

    met_spec = pl.BlockSpec(
        (pl.Element(16), pl.Element(lay.Ys)),
        lambda i: (0, 0), memory_space=pltpu.VMEM)

    shape = jax.ShapeDtypeStruct((lay.Xs, lay.Ys), jnp.float32)
    n_out = 6 + 2 * n_tracers

    extra = {}
    if vmem_limit_bytes is not None and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes)
    call = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=([in_spec() for _ in range(8)] + [met_spec]
                  + [in_spec() for _ in range(2 * n_tracers)]),
        out_specs=[out_spec() for _ in range(n_out)],
        out_shape=[shape] * n_out,
        interpret=interpret,
        **extra,
    )

    if lu_s is None:
        def step_raw(lu_a, hr_a, met_a, ssh, sshp, u, up, v, vp, *tracers):
            return tuple(call(lu_a, hr_a, ssh, sshp, u, up, v, vp, met_a,
                              *tracers))
        return step_raw

    lu_c = jnp.asarray(lu_s, jnp.float32)
    hr_c = jnp.asarray(hhq_rest_s, jnp.float32)
    met = jnp.asarray(metrics_profile, jnp.float32)

    def step(ssh, sshp, u, up, v, vp, *tracers):
        return tuple(call(lu_c, hr_c, ssh, sshp, u, up, v, vp, met,
                          *tracers))

    return step


def metrics_profile_from_grid(grid, lay: FusedLayout) -> np.ndarray:
    """Extract the (16, Ys) latitude profiles from a Grid; raises if any
    metric is not x-uniform (then use the jnp path)."""
    rows = np.zeros((16, lay.Ys), np.float32)
    names = ["dx", "dy", "dxt", "dyt", "dxh", "dyh", "dxb", "dyb", "rlh_s"]
    for k, name in enumerate(names):
        f = np.asarray(getattr(grid, name))
        if not np.allclose(f, f[:1, :], rtol=0, atol=0):
            raise ValueError(f"metric {name} is not x-uniform; "
                             "fused path unsupported (use jnp step)")
        rows[k, YPAD:YPAD + lay.ny] = f[0, :]
        # extend profiles into the y land margin so divisions stay finite
        rows[k, :YPAD] = f[0, 0]
        rows[k, YPAD + lay.ny:] = f[0, -1]
    # rows 9-15: reciprocal profiles (see kernel) — metric divisions
    # become multiplies on the VPU
    with np.errstate(divide="ignore"):
        rows[9] = np.float32(1.0) / (rows[0] * rows[1])   # 1/(dx*dy)
        for k, src in ((10, 2), (11, 3), (12, 4), (13, 5), (14, 6),
                       (15, 7)):
            rows[k] = np.float32(1.0) / rows[src]
    rows[9:16][~np.isfinite(rows[9:16])] = 0.0
    return rows
