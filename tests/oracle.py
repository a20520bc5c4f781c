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
