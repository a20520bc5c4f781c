"""Double-entry validation: vectorized jnp kernels vs the loop oracle.

Random masked basins, random fields; every SW + tracer kernel must agree
with the independent per-point loop implementation to f64 round-off.
"""

import numpy as np
import pytest

from ocean_model_arch_tpu.core import masks as mk
from ocean_model_arch_tpu.ops import depth_kernels as dk
from ocean_model_arch_tpu.ops import sw_kernels as swk
from ocean_model_arch_tpu.ops import tracer_kernels as trk
from ocean_model_arch_tpu.ops.stencil import pad

import oracle as orc

NX, NY = 23, 17


@pytest.fixture(scope="module")
def basin_fields():
    rng = np.random.RandomState(7)
    # random water/land interior inside the mandatory 2-cell land frame
    int_mask = mk.frame_of_land_mask(NX, NY)
    interior = rng.rand(NX - 4, NY - 4) < 0.8
    int_mask[2:-2, 2:-2] = (~interior).astype(np.int32)
    lu = mk.lu_from_int_mask(int_mask)
    luh, luu, llu, llv, lcu, lcv = mk.derive_staggered_masks(lu)

    def metric():
        return (1000.0 + 100.0 * rng.rand(NX, NY)).astype(np.float32)

    def field():
        return rng.randn(NX, NY).astype(np.float64)

    def posfield():
        return (50.0 + 10.0 * rng.rand(NX, NY)).astype(np.float64)

    m = {k: metric() for k in
         ("dx", "dy", "dxt", "dyt", "dxh", "dyh", "dxb", "dyb")}
    m["rlh_s"] = (1e-4 * rng.randn(NX, NY)).astype(np.float32)
    m["rdis"] = np.abs(1e-5 * rng.randn(NX, NY)).astype(np.float32)
    f = {k: field() for k in
         ("ssh", "sshn", "sshp", "u", "un", "up", "v", "vn", "vp",
          "vort", "str_t", "str_s", "rhsx", "rhsy", "rhsx_adv", "rhsy_adv",
          "rhsx_dif", "rhsy_dif", "ff", "ffp", "ffn", "flux_x", "flux_y")}
    f["mu"] = np.abs(field()) * 100.0
    h = {k: posfield() for k in
         ("hhu", "hhun", "hhup", "hhv", "hhvn", "hhvp", "hhh", "hq", "h_r",
          "hhqn", "hhqp")}
    masks = dict(lu=lu, luh=luh, luu=luu, llu=llu, llv=llv, lcu=lcu, lcv=lcv)
    return masks, m, f, h


def P(x):
    return pad(np.asarray(x))


def test_update_ssh(basin_fields):
    masks, m, f, h = basin_fields
    got = swk.update_ssh(1.0, P(masks["lu"]), P(m["dx"]), P(m["dy"]),
                         P(m["dxh"]), P(m["dyh"]), P(h["hhu"]), P(h["hhv"]),
                         P(f["sshn"]), P(f["sshp"]), P(f["u"]), P(f["v"]))
    want = orc.o_update_ssh(1.0, masks["lu"], m["dx"], m["dy"], m["dxh"],
                            m["dyh"], h["hhu"], h["hhv"], f["sshn"],
                            f["sshp"], f["u"], f["v"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-13, atol=1e-13)


def test_update_uv(basin_fields):
    masks, m, f, h = basin_fields
    gu, gv = swk.update_uv(
        1.0, P(masks["lcu"]), P(masks["lcv"]),
        P(m["dxt"]), P(m["dyt"]), P(m["dxh"]), P(m["dyh"]),
        P(m["dxb"]), P(m["dyb"]),
        P(h["hhu"]), P(h["hhun"]), P(h["hhup"]),
        P(h["hhv"]), P(h["hhvn"]), P(h["hhvp"]), P(h["hhh"]), P(f["ssh"]),
        P(f["u"]), P(f["un"]), P(f["up"]), P(f["v"]), P(f["vn"]), P(f["vp"]),
        P(m["rdis"]), P(m["rlh_s"]),
        P(f["rhsx"]), P(f["rhsy"]), P(f["rhsx_adv"]), P(f["rhsy_adv"]),
        P(f["rhsx_dif"]), P(f["rhsy_dif"]))
    wu, wv = orc.o_update_uv(
        1.0, masks["lcu"], masks["lcv"], m["dxt"], m["dyt"], m["dxh"],
        m["dyh"], m["dxb"], m["dyb"],
        h["hhu"], h["hhun"], h["hhup"], h["hhv"], h["hhvn"], h["hhvp"],
        h["hhh"], f["ssh"], f["u"], f["un"], f["up"], f["v"], f["vn"],
        f["vp"], m["rdis"], m["rlh_s"], f["rhsx"], f["rhsy"],
        f["rhsx_adv"], f["rhsy_adv"], f["rhsx_dif"], f["rhsy_dif"])
    np.testing.assert_allclose(np.asarray(gu), wu, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gv), wv, rtol=1e-12, atol=1e-12)


def test_next_step(basin_fields):
    masks, m, f, h = basin_fields
    got = swk.next_step(0.5, P(masks["lu"]), P(masks["lcu"]), P(masks["lcv"]),
                        P(f["ssh"]), P(f["sshn"]), P(f["sshp"]),
                        P(f["u"]), P(f["un"]), P(f["up"]),
                        P(f["v"]), P(f["vn"]), P(f["vp"]))
    want = orc.o_next_step(0.5, masks["lu"], masks["lcu"], masks["lcv"],
                           f["ssh"], f["sshn"], f["sshp"],
                           f["u"], f["un"], f["up"], f["v"], f["vn"], f["vp"])
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-14)


def test_vort(basin_fields):
    masks, m, f, h = basin_fields
    got = swk.uv_trans_vort(P(masks["luu"]), P(m["dxt"]), P(m["dyt"]),
                            P(m["dxb"]), P(m["dyb"]),
                            P(f["u"]), P(f["v"]), P(f["vort"]))
    want = orc.o_vort(masks["luu"], m["dxt"], m["dyt"], m["dxb"], m["dyb"],
                      f["u"], f["v"], f["vort"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_uv_trans(basin_fields):
    masks, m, f, h = basin_fields
    gx, gy = swk.uv_trans(P(masks["lcu"]), P(masks["lcv"]), P(masks["luu"]),
                          P(m["dxh"]), P(m["dyh"]),
                          P(f["u"]), P(f["v"]), P(f["vort"]),
                          P(h["hq"]), P(h["hhu"]), P(h["hhv"]), P(h["hhh"]),
                          P(f["rhsx_adv"]), P(f["rhsy_adv"]))
    wx, wy = orc.o_uv_trans(masks["lcu"], masks["lcv"], masks["luu"],
                            m["dxh"], m["dyh"], f["u"], f["v"], f["vort"],
                            h["hq"], h["hhu"], h["hhv"], h["hhh"],
                            f["rhsx_adv"], f["rhsy_adv"])
    np.testing.assert_allclose(np.asarray(gx), wx, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy), wy, rtol=1e-12, atol=1e-12)


def test_stress(basin_fields):
    masks, m, f, h = basin_fields
    gt, gs = swk.stress_components(
        P(masks["lu"]), P(masks["luu"]), P(m["dx"]), P(m["dy"]),
        P(m["dxt"]), P(m["dyt"]), P(m["dxh"]), P(m["dyh"]),
        P(m["dxb"]), P(m["dyb"]), P(f["up"]), P(f["vp"]),
        P(f["str_t"]), P(f["str_s"]))
    wt, ws = orc.o_stress(masks["lu"], masks["luu"], m["dx"], m["dy"],
                          m["dxt"], m["dyt"], m["dxh"], m["dyh"],
                          m["dxb"], m["dyb"], f["up"], f["vp"],
                          f["str_t"], f["str_s"])
    np.testing.assert_allclose(np.asarray(gt), wt, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gs), ws, rtol=1e-12, atol=1e-12)


def test_uv_diff2(basin_fields):
    masks, m, f, h = basin_fields
    gx, gy = swk.uv_diff2(
        P(masks["lcu"]), P(masks["lcv"]), P(m["dx"]), P(m["dy"]),
        P(m["dxt"]), P(m["dyt"]), P(m["dxh"]), P(m["dyh"]),
        P(m["dxb"]), P(m["dyb"]), P(f["mu"]), P(f["str_t"]), P(f["str_s"]),
        P(h["hq"]), P(h["hhu"]), P(h["hhv"]), P(h["hhh"]),
        P(f["rhsx_dif"]), P(f["rhsy_dif"]))
    wx, wy = orc.o_uv_diff2(masks["lcu"], masks["lcv"], m["dx"], m["dy"],
                            m["dxt"], m["dyt"], m["dxh"], m["dyh"],
                            m["dxb"], m["dyb"], f["mu"], f["str_t"],
                            f["str_s"], h["hq"], h["hhu"], h["hhv"],
                            h["hhh"], f["rhsx_dif"], f["rhsy_dif"])
    np.testing.assert_allclose(np.asarray(gx), wx, rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gy), wy, rtol=1e-11, atol=1e-11)


def test_hh_init(basin_fields):
    masks, m, f, h = basin_fields
    got = dk.hh_init(1, P(masks["lu"]), P(masks["llu"]), P(masks["llv"]),
                     P(masks["luh"]), P(m["dx"]), P(m["dy"]),
                     P(m["dxt"]), P(m["dyt"]), P(m["dxh"]), P(m["dyh"]),
                     P(m["dxb"]), P(m["dyb"]),
                     P(f["ssh"]), P(f["sshp"]), P(h["h_r"]),
                     *[P(np.zeros((NX, NY))) for _ in range(9)])
    want = orc.o_hh_init(1, masks["lu"], masks["llu"], masks["llv"],
                         masks["luh"], m["dx"], m["dy"], m["dxt"], m["dyt"],
                         m["dxh"], m["dyh"], m["dxb"], m["dyb"],
                         f["ssh"], f["sshp"], h["h_r"])
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-12, atol=1e-12)


def test_tracer_fluxes(basin_fields):
    masks, m, f, h = basin_fields
    gx, gy = trk.tran_diff_fluxes(
        P(masks["lcu"]), P(masks["lcv"]), P(m["dxt"]), P(m["dyt"]),
        P(m["dxh"]), P(m["dyh"]), P(h["hhu"]), P(h["hhv"]),
        P(f["ff"]), P(f["ffp"]), P(f["u"]), P(f["v"]), P(f["mu"]), 1.0,
        P(f["flux_x"]), P(f["flux_y"]))
    wx, wy = orc.o_tracer_fluxes(masks["lcu"], masks["lcv"], m["dxt"],
                                 m["dyt"], m["dxh"], m["dyh"],
                                 h["hhu"], h["hhv"], f["ff"], f["u"],
                                 f["v"], f["mu"], 1.0,
                                 f["flux_x"], f["flux_y"])
    np.testing.assert_allclose(np.asarray(gx), wx, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy), wy, rtol=1e-12, atol=1e-12)


def test_tracer_update(basin_fields):
    masks, m, f, h = basin_fields
    got = trk.tran_diff_tracer(1.0, P(masks["lu"]), P(m["dx"]), P(m["dy"]),
                               P(h["hhqn"]), P(h["hhqp"]),
                               P(f["flux_x"]), P(f["flux_y"]),
                               P(f["ffp"]), P(f["ffn"]))
    want = orc.o_tracer_update(1.0, masks["lu"], m["dx"], m["dy"],
                               h["hhqn"], h["hhqp"], f["flux_x"],
                               f["flux_y"], f["ffp"], f["ffn"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)
