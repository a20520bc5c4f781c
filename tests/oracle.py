"""Loop-based numpy oracle for the physics kernels.

Independent re-expression of the reference kernels' loop semantics
(kernel/shallow_water/*.f90, kernel/tracer/leapfrog_tracer.f90) as literal
per-point loops — deliberately *not* sharing code with the vectorized
ops/ kernels, so the two implementations double-check each other
(the build environment has no Fortran toolchain to run the reference
directly).

Index convention: 0-based [m, n]; out-of-bounds neighbour reads return 0.0
(the reference's zero-initialized ghost frames).
"""

import numpy as np

G = np.float32(9.8)  # FreeFallAcc is real4 in the reference (constants.f90)


class A:
    """Zero-padded accessor over an unpadded array."""

    def __init__(self, arr):
        self.arr = arr

    def __call__(self, m, n):
        nx, ny = self.arr.shape
        if 0 <= m < nx and 0 <= n < ny:
            return self.arr[m, n]
        return self.arr.dtype.type(0)


def o_update_ssh(tau, lu, dx, dy, dxh, dyh, hhu, hhv, sshn, sshp, u, v):
    out = sshn.copy()
    nx, ny = lu.shape
    U = A(u * hhu * dyh)
    V = A(v * hhv * dxh)
    for m in range(nx):
        for n in range(ny):
            if lu[m, n] > 0.5:
                div = (U(m, n) - U(m - 1, n) + V(m, n) - V(m, n - 1)) \
                    / (dx[m, n] * dy[m, n])
                out[m, n] = sshp[m, n] + 2.0 * tau * (-div)
    return out


def o_update_uv(tau, lcu, lcv, dxt, dyt, dxh, dyh, dxb, dyb,
                hhu, hhun, hhup, hhv, hhvn, hhvp, hhh, ssh,
                u, un, up, v, vn, vp, rdis, rlh_s,
                rhsx, rhsy, rhsx_adv, rhsy_adv, rhsx_dif, rhsy_dif):
    un_out, vn_out = un.copy(), vn.copy()
    nx, ny = lcu.shape
    cor = A(np.float64(rlh_s) * hhh * np.float64(dxb) * np.float64(dyb))
    sshA, uA, vA, rdisA = A(ssh), A(u), A(v), A(rdis)
    for m in range(nx):
        for n in range(ny):
            if lcu[m, n] > 0.5:
                bp = hhun[m, n] * dxt[m, n] * dyh[m, n] / 2.0 / tau
                bp0 = hhup[m, n] * dxt[m, n] * dyh[m, n] / 2.0 / tau
                slx = -G * (sshA(m + 1, n) - ssh[m, n]) * dyh[m, n] * hhu[m, n]
                grx = (rhsx[m, n] + slx + rhsx_dif[m, n] + rhsx_adv[m, n]
                       - (rdisA(m, n) + rdisA(m + 1, n)) / 2.0
                       * up[m, n] * dxt[m, n] * dyh[m, n] * hhu[m, n]
                       + (cor(m, n) * (vA(m + 1, n) + vA(m, n))
                          + cor(m, n - 1) * (vA(m + 1, n - 1) + vA(m, n - 1))
                          ) / 4.0)
                un_out[m, n] = (up[m, n] * bp0 + grx) / bp
            if lcv[m, n] > 0.5:
                bp = hhvn[m, n] * dyt[m, n] * dxh[m, n] / 2.0 / tau
                bp0 = hhvp[m, n] * dyt[m, n] * dxh[m, n] / 2.0 / tau
                sly = -G * (sshA(m, n + 1) - ssh[m, n]) * dxh[m, n] * hhv[m, n]
                gry = (rhsy[m, n] + sly + rhsy_dif[m, n] + rhsy_adv[m, n]
                       - (rdisA(m, n) + rdisA(m, n + 1)) / 2.0
                       * vp[m, n] * dxh[m, n] * dyt[m, n] * hhv[m, n]
                       - (cor(m, n) * (uA(m, n + 1) + uA(m, n))
                          + cor(m - 1, n) * (uA(m - 1, n + 1) + uA(m - 1, n))
                          ) / 4.0)
                vn_out[m, n] = (vp[m, n] * bp0 + gry) / bp
    return un_out, vn_out


def o_next_step(ts, lu, lcu, lcv, ssh, sshn, sshp, u, un, up, v, vn, vp):
    ssh2, sshp2 = ssh.copy(), sshp.copy()
    u2, up2 = u.copy(), up.copy()
    v2, vp2 = v.copy(), vp.copy()
    nx, ny = lu.shape
    for m in range(nx):
        for n in range(ny):
            if lu[m, n] > 0.5:
                sshp2[m, n] = ssh[m, n] + ts * (sshn[m, n] - 2.0 * ssh[m, n]
                                                + sshp[m, n]) / 2.0
                ssh2[m, n] = sshn[m, n]
            if lcu[m, n] > 0.5:
                up2[m, n] = u[m, n] + ts * (un[m, n] - 2.0 * u[m, n]
                                            + up[m, n]) / 2.0
                u2[m, n] = un[m, n]
            if lcv[m, n] > 0.5:
                vp2[m, n] = v[m, n] + ts * (vn[m, n] - 2.0 * v[m, n]
                                            + vp[m, n]) / 2.0
                v2[m, n] = vn[m, n]
    return ssh2, sshp2, u2, up2, v2, vp2


def o_vort(luu, dxt, dyt, dxb, dyb, u, v, vort):
    out = vort.copy()
    nx, ny = luu.shape
    uA, vA = A(u), A(v)
    dxtA, dytA = A(dxt.astype(np.float64)), A(dyt.astype(np.float64))
    for m in range(nx):
        for n in range(ny):
            if luu[m, n] > 0.5:
                out[m, n] = ((vA(m + 1, n) * dytA(m + 1, n)
                              - v[m, n] * dyt[m, n])
                             - (uA(m, n + 1) * dxtA(m, n + 1)
                                - u[m, n] * dxt[m, n])
                             - ((vA(m + 1, n) - v[m, n]) * dyb[m, n]
                                - (uA(m, n + 1) - u[m, n]) * dxb[m, n]))
    return out


def o_uv_trans(lcu, lcv, luu, dxh, dyh, u, v, vort, hq, hu, hv, hh,
               rhsx_adv, rhsy_adv):
    rx, ry = rhsx_adv.copy(), rhsy_adv.copy()
    nx, ny = lcu.shape
    ud = A(u * np.float64(dyh) * hu)
    vd = A(v * np.float64(dxh) * hv)
    vh = A(vort * hh)
    uA, vA, luuA = A(u), A(v), A(luu)
    for m in range(nx):
        for n in range(ny):
            if lcu[m, n] > 0.5:
                fx_p = (ud(m, n) + ud(m + 1, n)) / 2.0 * (uA(m, n) + uA(m + 1, n)) / 2.0
                fx_m = (ud(m, n) + ud(m - 1, n)) / 2.0 * (uA(m, n) + uA(m - 1, n)) / 2.0
                fy_p = (vd(m, n) + vd(m + 1, n)) / 2.0 \
                    * (uA(m, n + 1) + uA(m, n)) / 2.0 * np.float64(luuA(m, n))
                fy_m = (vd(m, n - 1) + vd(m + 1, n - 1)) / 2.0 \
                    * (uA(m, n - 1) + uA(m, n)) / 2.0 * np.float64(luuA(m, n - 1))
                rx[m, n] = (-(fx_p - fx_m + fy_p - fy_m)
                            + (vh(m, n) * (vA(m + 1, n) + vA(m, n))
                               + vh(m, n - 1) * (vA(m + 1, n - 1) + vA(m, n - 1))) / 4.0)
            if lcv[m, n] > 0.5:
                fy_p = (vd(m, n) + vd(m, n + 1)) / 2.0 * (vA(m, n) + vA(m, n + 1)) / 2.0
                fy_m = (vd(m, n) + vd(m, n - 1)) / 2.0 * (vA(m, n) + vA(m, n - 1)) / 2.0
                fx_p = (ud(m, n) + ud(m, n + 1)) / 2.0 * (vA(m + 1, n) + vA(m, n)) / 2.0
                fx_m = (ud(m - 1, n) + ud(m - 1, n + 1)) / 2.0 * (vA(m - 1, n) + vA(m, n)) / 2.0
                ry[m, n] = (-(fx_p - fx_m + fy_p - fy_m)
                            - (vh(m, n) * (uA(m, n + 1) + uA(m, n))
                               + vh(m - 1, n) * (uA(m - 1, n + 1) + uA(m - 1, n))) / 4.0)
    return rx, ry


def o_stress(lu, luu, dx, dy, dxt, dyt, dxh, dyh, dxb, dyb, u, v,
             str_t, str_s):
    st, ss = str_t.copy(), str_s.copy()
    nx, ny = lu.shape
    q = A(u / np.float64(dyh))
    r = A(v / np.float64(dxh))
    s1 = A(u / np.float64(dxt))
    s2 = A(v / np.float64(dyt))
    for m in range(nx):
        for n in range(ny):
            if lu[m, n] > 0.5:
                st[m, n] = (np.float64(dy[m, n] / dx[m, n]) * (q(m, n) - q(m - 1, n))
                            - np.float64(dx[m, n] / dy[m, n]) * (r(m, n) - r(m, n - 1)))
            if luu[m, n] > 0.5:
                ss[m, n] = (np.float64(dxb[m, n] / dyb[m, n]) * (s1(m, n + 1) - s1(m, n))
                            + np.float64(dyb[m, n] / dxb[m, n]) * (s2(m + 1, n) - s2(m, n)))
    return st, ss


def o_uv_diff2(lcu, lcv, dx, dy, dxt, dyt, dxh, dyh, dxb, dyb,
               mu, str_t, str_s, hq, hu, hv, hh, rhsx_dif, rhsy_dif):
    rx, ry = rhsx_dif.copy(), rhsy_dif.copy()
    nx, ny = lcu.shape
    muA, hhA, ssA = A(mu), A(hh), A(str_s)
    aA = A((dy * dy) * mu * hq * str_t)     # dy**2 in f32, as Fortran
    bA = A((dx * dx) * mu * hq * str_t)
    dxb2A = A((dxb * dxb))
    dyb2A = A((dyb * dyb))
    for m in range(nx):
        for n in range(ny):
            muh_p = (muA(m, n) + muA(m + 1, n) + muA(m, n + 1) + muA(m + 1, n + 1)) / 4.0
            if lcu[m, n] > 0.5:
                muh_m = (muA(m, n) + muA(m + 1, n) + muA(m, n - 1) + muA(m + 1, n - 1)) / 4.0
                rx[m, n] = ((aA(m + 1, n) - aA(m, n)) / dyh[m, n]
                            + (dxb2A(m, n) * muh_p * hhA(m, n) * ssA(m, n)
                               - dxb2A(m, n - 1) * muh_m * hhA(m, n - 1) * ssA(m, n - 1)
                               ) / dxt[m, n])
            if lcv[m, n] > 0.5:
                muh_m = (muA(m, n) + muA(m - 1, n) + muA(m, n + 1) + muA(m - 1, n + 1)) / 4.0
                ry[m, n] = (-(bA(m, n + 1) - bA(m, n)) / dxh[m, n]
                            + (dyb2A(m, n) * muh_p * hhA(m, n) * ssA(m, n)
                               - dyb2A(m - 1, n) * muh_m * hhA(m - 1, n) * ssA(m - 1, n)
                               ) / dyt[m, n])
    return rx, ry


def o_hh_init(ffs, lu, llu, llv, luh, dx, dy, dxt, dyt, dxh, dyh, dxb, dyb,
              ssh, sshp, h_r):
    nx, ny = lu.shape
    hq = h_r + ssh * float(ffs)
    hqp = h_r + sshp * float(ffs)
    hqn = h_r.copy()
    out = {k: np.zeros_like(hq) for k in
           ("hu", "hup", "hun", "hv", "hvp", "hvn", "hh", "hhp", "hhn")}
    luA = A(lu)
    acc = {"": A(hq * np.float64(dx) * np.float64(dy) * lu),
           "p": A(hqp * np.float64(dx) * np.float64(dy) * lu),
           "n": A(hqn * np.float64(dx) * np.float64(dy) * lu)}
    for m in range(nx):
        for n in range(ny):
            if llu[m, n] > 0.5:
                slu = np.float64(luA(m, n) + luA(m + 1, n))
                for sfx in ("", "p", "n"):
                    q = acc[sfx]
                    out["hu" + sfx][m, n] = (q(m, n) + q(m + 1, n)) \
                        / slu / dxt[m, n] / dyh[m, n]
            if llv[m, n] > 0.5:
                slu = np.float64(luA(m, n) + luA(m, n + 1))
                for sfx in ("", "p", "n"):
                    q = acc[sfx]
                    out["hv" + sfx][m, n] = (q(m, n) + q(m, n + 1)) \
                        / slu / dxh[m, n] / dyt[m, n]
            if luh[m, n] > 0.5:
                slu = np.float64(luA(m, n) + luA(m + 1, n) + luA(m, n + 1)
                                 + luA(m + 1, n + 1))
                for sfx in ("", "p", "n"):
                    q = acc[sfx]
                    out["hh" + sfx][m, n] = (q(m, n) + q(m + 1, n)
                                             + q(m, n + 1) + q(m + 1, n + 1)) \
                        / slu / dxb[m, n] / dyb[m, n]
    return (hq, hqp, hqn, out["hu"], out["hup"], out["hun"],
            out["hv"], out["hvp"], out["hvn"],
            out["hh"], out["hhp"], out["hhn"])


def o_tracer_fluxes(lcu, lcv, dxt, dyt, dxh, dyh, hhu, hhv, ff, uu, vv, mu,
                    factor_mu, flux_x, flux_y):
    fx, fy = flux_x.copy(), flux_y.copy()
    nx, ny = lcu.shape
    ffA, muA = A(ff), A(mu)
    for m in range(nx):
        for n in range(ny):
            if lcu[m, n] > 0.5:
                dfdx = ffA(m + 1, n) - ff[m, n]
                mu1 = (muA(m, n) + muA(m + 1, n)) / 2.0 * factor_mu \
                    * dyh[m, n] / dxt[m, n]
                fx[m, n] = (-uu[m, n] * hhu[m, n] * dyh[m, n]
                            * (ff[m, n] + ffA(m + 1, n)) / 2.0
                            + mu1 * hhu[m, n] * dfdx)
            if lcv[m, n] > 0.5:
                dfdy = ffA(m, n + 1) - ff[m, n]
                mu1 = (muA(m, n) + muA(m, n + 1)) / 2.0 * factor_mu \
                    * dxh[m, n] / dyt[m, n]
                fy[m, n] = (-vv[m, n] * hhv[m, n] * dxh[m, n]
                            * (ff[m, n] + ffA(m, n + 1)) / 2.0
                            + mu1 * hhv[m, n] * dfdy)
    return fx, fy


def o_tracer_update(tau, lu, dx, dy, hhqn, hhqp, flux_x, flux_y, ffp, ffn):
    out = ffn.copy()
    nx, ny = lu.shape
    fxA, fyA = A(flux_x), A(flux_y)
    for m in range(nx):
        for n in range(ny):
            if lu[m, n] > 0.5:
                bp = hhqn[m, n] * dx[m, n] * dy[m, n] / tau / 2.0
                bp0 = hhqp[m, n] * dx[m, n] * dy[m, n] / tau / 2.0
                rhs = fxA(m, n) - fxA(m - 1, n) + fyA(m, n) - fyA(m, n - 1)
                out[m, n] = (bp0 * ffp[m, n] + rhs) / bp
    return out


# ---------------------------------------------------------------------------
# Whole-model composition oracle
# ---------------------------------------------------------------------------
# Literal loop re-expression of ONE FULL MODEL STEP: the 11-stage kernel
# sequence of expl_shallow_water (control/shallow_water/shallow_water.f90:
# 22-94) followed by expl_tracer (control/tracer.f90:33-62), with the
# exact per-stage array bindings of interface/shallow_water/sw_interface.f90
# and interface/tracer/tracer_interface.f90 — which time level feeds which
# kernel, inout persistence at unmasked points, and the end-of-step
# hh_shift/hh_init ordering. This pins the *composition*, complementing the
# per-kernel oracles above.

def o_hh_update(lu, llu, llv, luh, dx, dy, dxt, dyt, dxh, dyh, dxb, dyb,
                ssh, h_r, hqn, hun, hvn, hhn):
    """depth.f90:101-162 — new-level depths from CURRENT ssh (the kernel is
    only invoked when full_free_surface>0, so no ffs factor). hqn is written
    pointwise everywhere; interpolations keep previous values off-mask."""
    nx, ny = lu.shape
    hqn2 = h_r + ssh
    hun2, hvn2, hhn2 = hun.copy(), hvn.copy(), hhn.copy()
    luA = A(lu)
    q = A(hqn2 * np.float64(dx) * np.float64(dy) * lu)
    for m in range(nx):
        for n in range(ny):
            if llu[m, n] > 0.5:
                slu = np.float64(luA(m, n) + luA(m + 1, n))
                hun2[m, n] = (q(m, n) + q(m + 1, n)) / slu \
                    / dxt[m, n] / dyh[m, n]
            if llv[m, n] > 0.5:
                slu = np.float64(luA(m, n) + luA(m, n + 1))
                hvn2[m, n] = (q(m, n) + q(m, n + 1)) / slu \
                    / dxh[m, n] / dyt[m, n]
            if luh[m, n] > 0.5:
                slu = np.float64(luA(m, n) + luA(m + 1, n)
                                 + luA(m, n + 1) + luA(m + 1, n + 1))
                hhn2[m, n] = (q(m, n) + q(m + 1, n) + q(m, n + 1)
                              + q(m + 1, n + 1)) / slu \
                    / dxb[m, n] / dyb[m, n]
    return hqn2, hun2, hvn2, hhn2


def o_hh_shift(ts, lu, llu, llv, luh, hq, hqp, hqn, hu, hup, hun,
               hv, hvp, hvn, hh, hhp, hhn):
    """depth.f90:164-211 — Robert-Asselin filter on the depth families."""
    nx, ny = lu.shape
    out = [a.copy() for a in (hq, hqp, hu, hup, hv, hvp, hh, hhp)]
    hq2, hqp2, hu2, hup2, hv2, hvp2, hh2, hhp2 = out
    for m in range(nx):
        for n in range(ny):
            if llu[m, n] > 0.5:
                hup2[m, n] = hu[m, n] + ts * (hun[m, n] - 2.0 * hu[m, n]
                                              + hup[m, n]) / 2.0
                hu2[m, n] = hun[m, n]
            if llv[m, n] > 0.5:
                hvp2[m, n] = hv[m, n] + ts * (hvn[m, n] - 2.0 * hv[m, n]
                                              + hvp[m, n]) / 2.0
                hv2[m, n] = hvn[m, n]
            if lu[m, n] > 0.5:
                hqp2[m, n] = hq[m, n] + ts * (hqn[m, n] - 2.0 * hq[m, n]
                                              + hqp[m, n]) / 2.0
                hq2[m, n] = hqn[m, n]
            if luh[m, n] > 0.5:
                hhp2[m, n] = hh[m, n] + ts * (hhn[m, n] - 2.0 * hh[m, n]
                                              + hhp[m, n]) / 2.0
                hh2[m, n] = hhn[m, n]
    return hq2, hqp2, hu2, hup2, hv2, hvp2, hh2, hhp2


def o_hh_init_inout(ffs, masks, mets, ssh, sshp, h_r, prev):
    """hh_init with the reference's inout semantics: hq/hqp/hqn families are
    pointwise overwrites (depth.f90:48-50), staggered interpolations keep
    ``prev`` values at unmasked points (the if-guards)."""
    (hq, hqp, hqn, hu, hup, hun, hv, hvp, hvn,
     hh, hhp, hhn) = o_hh_init(
        ffs, masks["lu"], masks["llu"], masks["llv"], masks["luh"],
        mets["dx"], mets["dy"], mets["dxt"], mets["dyt"],
        mets["dxh"], mets["dyh"], mets["dxb"], mets["dyb"],
        ssh, sshp, h_r)
    mu_ = masks["llu"] > 0.5
    mv_ = masks["llv"] > 0.5
    mh_ = masks["luh"] > 0.5
    return (hq, hqp, hqn,
            np.where(mu_, hu, prev["hhu"]),
            np.where(mu_, hup, prev["hhu_p"]),
            np.where(mu_, hun, prev["hhu_n"]),
            np.where(mv_, hv, prev["hhv"]),
            np.where(mv_, hvp, prev["hhv_p"]),
            np.where(mv_, hvn, prev["hhv_n"]),
            np.where(mh_, hh, prev["hhh"]),
            np.where(mh_, hhp, prev["hhh_p"]),
            np.where(mh_, hhn, prev["hhh_n"]))


def o_tracer_next_step(ts, lu, ffn, ffp, ff):
    """leapfrog_tracer.f90:143-170."""
    ff2, ffp2 = ff.copy(), ffp.copy()
    nx, ny = lu.shape
    for m in range(nx):
        for n in range(ny):
            if lu[m, n] > 0.5:
                ffp2[m, n] = ff[m, n] + ts * (ffn[m, n] - 2.0 * ff[m, n]
                                              + ffp[m, n]) / 2.0
                ff2[m, n] = ffn[m, n]
    return ff2, ffp2


def o_model_step(st, masks, mets, h_r, cfg, tau):
    """One full model step: expl_shallow_water + expl_tracer composition.

    ``st``: dict of numpy state arrays (mutated copy returned);
    ``masks``/``mets``: grid arrays; ``cfg``: dict with ffs, trans, ksw,
    ts, tracer_num keys.
    """
    st = dict(st)
    ffs, trans, ksw, ts = cfg["ffs"], cfg["trans"], cfg["ksw"], cfg["ts"]

    # 1. continuity (shallow_water.f90:36-38)        [sync sshn]
    st["sshn"] = o_update_ssh(
        tau, masks["lu"], mets["dx"], mets["dy"], mets["dxh"], mets["dyh"],
        st["hhu"], st["hhv"], st["sshn"], st["sshp"], st["u"], st["v"])

    # 2. new-level depths from current ssh (:40-44)  [sync hh*_n]
    if ffs:
        (st["hhq_n"], st["hhu_n"], st["hhv_n"], st["hhh_n"]) = o_hh_update(
            masks["lu"], masks["llu"], masks["llv"], masks["luh"],
            mets["dx"], mets["dy"], mets["dxt"], mets["dyt"],
            mets["dxh"], mets["dyh"], mets["dxb"], mets["dyb"],
            st["ssh"], h_r, st["hhq_n"], st["hhu_n"], st["hhv_n"],
            st["hhh_n"])

    # 3-4. momentum advection (:47-56)               [sync vort; lazy hh*_p]
    if trans:
        st["vort"] = o_vort(masks["luu"], mets["dxt"], mets["dyt"],
                            mets["dxb"], mets["dyb"], st["u"], st["v"],
                            st["vort"])
        st["rhsx_adv"], st["rhsy_adv"] = o_uv_trans(
            masks["lcu"], masks["lcv"], masks["luu"],
            mets["dxh"], mets["dyh"], st["u"], st["v"], st["vort"],
            st["hhq"], st["hhu"], st["hhv"], st["hhh"],
            st["rhsx_adv"], st["rhsy_adv"])

    # 5-6. lateral viscosity from the p level (:58-66) [sync str_t/str_s]
    if ksw:
        st["str_t"], st["str_s"] = o_stress(
            masks["lu"], masks["luu"], mets["dx"], mets["dy"],
            mets["dxt"], mets["dyt"], mets["dxh"], mets["dyh"],
            mets["dxb"], mets["dyb"], st["up"], st["vp"],
            st["str_t"], st["str_s"])
        st["rhsx_dif"], st["rhsy_dif"] = o_uv_diff2(
            masks["lcu"], masks["lcv"], mets["dx"], mets["dy"],
            mets["dxt"], mets["dyt"], mets["dxh"], mets["dyh"],
            mets["dxb"], mets["dyb"], st["mu"], st["str_t"], st["str_s"],
            st["hhq"], st["hhu"], st["hhv"], st["hhh"],
            st["rhsx_dif"], st["rhsy_dif"])

    # 7. momentum update (:68-70)                    [sync ubrtrn, vbrtrn]
    st["un"], st["vn"] = o_update_uv(
        tau, masks["lcu"], masks["lcv"], mets["dxt"], mets["dyt"],
        mets["dxh"], mets["dyh"], mets["dxb"], mets["dyb"],
        st["hhu"], st["hhu_n"], st["hhu_p"],
        st["hhv"], st["hhv_n"], st["hhv_p"], st["hhh"], st["ssh"],
        st["u"], st["un"], st["up"], st["v"], st["vn"], st["vp"],
        st["r_diss"], mets["rlh_s"],
        st["rhsx"], st["rhsy"], st["rhsx_adv"], st["rhsy_adv"],
        st["rhsx_dif"], st["rhsy_dif"])

    # 8. leapfrog rotation + filter (:73-75)
    (st["ssh"], st["sshp"], st["u"], st["up"], st["v"], st["vp"]) = \
        o_next_step(ts, masks["lu"], masks["lcu"], masks["lcv"],
                    st["ssh"], st["sshn"], st["sshp"],
                    st["u"], st["un"], st["up"], st["v"], st["vn"], st["vp"])

    if ffs:
        # 9. depth-family filter (:77-81) — fully overwritten by hh_init
        # below, but applied faithfully (composition parity)
        (st["hhq"], st["hhq_p"], st["hhu"], st["hhu_p"], st["hhv"],
         st["hhv_p"], st["hhh"], st["hhh_p"]) = o_hh_shift(
            ts, masks["lu"], masks["llu"], masks["llv"], masks["luh"],
            st["hhq"], st["hhq_p"], st["hhq_n"],
            st["hhu"], st["hhu_p"], st["hhu_n"],
            st["hhv"], st["hhv_p"], st["hhv_n"],
            st["hhh"], st["hhh_p"], st["hhh_n"])
        # 10. depth re-init from ROTATED (ssh, sshp) (:83-88) [sync hh*]
        (st["hhq"], st["hhq_p"], st["hhq_n"],
         st["hhu"], st["hhu_p"], st["hhu_n"],
         st["hhv"], st["hhv_p"], st["hhv_n"],
         st["hhh"], st["hhh_p"], st["hhh_n"]) = o_hh_init_inout(
            ffs, masks, mets, st["ssh"], st["sshp"], h_r, st)

    # 11. check_ssh_err (:90-93) — no state effect

    # expl_tracer (tracer.f90:33-62): per tracer, fluxes -> update -> filter
    for k in range(cfg["tracer_num"]):
        fx, fy = o_tracer_fluxes(
            masks["lcu"], masks["lcv"], mets["dxt"], mets["dyt"],
            mets["dxh"], mets["dyh"], st["hhu"], st["hhv"],
            st["ff"][k], st["u"], st["v"], st["mu"], 1.0,
            st["flux_x"], st["flux_y"])
        ffn = o_tracer_update(
            tau, masks["lu"], mets["dx"], mets["dy"],
            st["hhq_n"], st["hhq_p"], fx, fy, st["ffp"][k], st["ffn"][k])
        ff2, ffp2 = o_tracer_next_step(
            ts, masks["lu"], ffn, st["ffp"][k], st["ff"][k])
        st["ff"] = [a.copy() for a in st["ff"]]
        st["ffp"] = [a.copy() for a in st["ffp"]]
        st["ffn"] = [a.copy() for a in st["ffn"]]
        st["ff"][k], st["ffp"][k], st["ffn"][k] = ff2, ffp2, ffn
        st["flux_x"], st["flux_y"] = fx, fy

    return st
