"""Section/tiling budget probe for the fused step (runs on the chip).

Benches build_fused_sw_step variants on the bench workload shape to
attribute VPU time (the kernel is VPU-bound; see roofline_probe.py):
  - full step (trans=1) at tx = 64 / 128 / 256
  - advection off (trans=0) — the uv_trans/vort section's share

Each variant is one Mosaic compile (minutes on the tunnel, persistently
cached). Usage: python scripts/fused_variants_probe.py [variant ...]
with variants from: tx64 tx128 tx256 notrans; default: all.
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from ocean_model_arch_tpu.utils.cache import enable_compilation_cache


def bench_variant(name, tx, trans, vmem=None, n_inner=2000, windows=3,
                  static_rslu=False, steps_per_call=1, ty=None, my=128,
                  mask="frame", stacked=False, rcp_div=False,
                  persistent=False, resident_planes=False,
                  narrow_chain=False, elide_sel=None, q4=None,
                  share_prev=False):
    from ocean_model_arch_tpu.config import (ModelConfig, Precision,
                                             SWConfig, basinpar_as250m_test)
    from ocean_model_arch_tpu.core.grid import build_grid
    from ocean_model_arch_tpu.core.masks import frame_of_land_mask
    from ocean_model_arch_tpu.model.fused import FusedSWModel
    from ocean_model_arch_tpu.model.init import init_ocean_state
    from ocean_model_arch_tpu.ops.pallas import fused_step as _fsk
    import dataclasses

    if narrow_chain:
        # set the module flag directly: relying on the env var alone
        # would silently benchmark the default kernel under this label
        _fsk.NARROW_CHAIN = True

    basin = basinpar_as250m_test()
    prec = Precision.f32()
    cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=0),
                      precision=prec)
    if not trans:
        cfg = dataclasses.replace(
            cfg, sw=dataclasses.replace(cfg.sw, trans_terms=0))
    if mask == "azov":
        from ocean_model_arch_tpu.io.mask_io import read_mask
        int_mask = read_mask("data/AS/maskAzovCor.txt", basin.nx, basin.ny)
    else:
        int_mask = frame_of_land_mask(basin.nx, basin.ny)
    grid = build_grid(basin, int_mask, precision=prec)
    state = init_ocean_state(grid, cfg)
    fm = FusedSWModel(grid, cfg, 1.0, tx=tx, vmem_limit_bytes=vmem,
                      static_rslu=static_rslu,
                      steps_per_call=steps_per_call, ty=ty, my=my,
                      stacked=stacked, rcp_div=rcp_div,
                      persistent=persistent,
                      resident_planes=resident_planes,
                      elide_sel=elide_sel, q4=q4, share_prev=share_prev)
    carry = fm.pack(state)

    @jax.jit
    def run(s6):
        return fm.run_steps(s6, n_inner)

    t0 = time.perf_counter()
    carry, ok = run(carry)
    jax.block_until_ready(ok)
    compile_s = time.perf_counter() - t0
    if not bool(ok):
        raise RuntimeError("stability guard tripped in warmup")
    best = float("inf")
    for _ in range(windows):
        # bool(ok) transfers the flag — a true barrier; plain
        # block_until_ready can return early on the tunneled platform
        t0 = time.perf_counter()
        carry, ok = run(carry)
        good = bool(ok)
        best = min(best, time.perf_counter() - t0)
        if not good:
            raise RuntimeError("stability guard tripped")
    ms = best / n_inner * 1e3
    pts = basin.nx * basin.ny
    import numpy as _np
    wet = float((_np.asarray(int_mask) == 0).mean())
    print(f"{name:12s} {ms:.4f} ms/step  {pts / ms * 1e3 / 1e9:6.2f} "
          f"Gpts/s  {pts * wet / ms * 1e3 / 1e9:6.2f} Gwet/s "
          f"(first-call {compile_s:.0f}s)", flush=True)


VARIANTS = {
    "tx64": dict(tx=64, trans=1),
    "tx128": dict(tx=128, trans=1, vmem=48 * 1024 * 1024),
    "tx256": dict(tx=256, trans=1, vmem=100 * 1024 * 1024),
    "notrans": dict(tx=64, trans=0),
    "rslu64": dict(tx=64, trans=1, static_rslu=True),
    "rslu128": dict(tx=128, trans=1, vmem=48 * 1024 * 1024,
                    static_rslu=True),
    # v2 kernel: config-dependent static planes + steps_per_call chaining.
    # NO vmem cap: capping at 64 MB costs ~10% (15.37 vs 16.87 same-
    # session, r4) — Mosaic pipelines deeper with the default budget;
    # this is also why bench.py (uncapped) reads ~1.5 Gpts/s above the
    # historically capped probe numbers
    "rslu64x2": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2),
    "rslu128x2": dict(tx=128, trans=1, static_rslu=True, steps_per_call=2,
                      vmem=100 * 1024 * 1024),
    "plain64x2": dict(tx=64, trans=1, static_rslu=False, steps_per_call=2,
                      vmem=64 * 1024 * 1024),
    "rslu256": dict(tx=256, trans=1, static_rslu=True,
                    vmem=100 * 1024 * 1024),
    "rslu512": dict(tx=512, trans=1, static_rslu=True,
                    vmem=110 * 1024 * 1024),
    "rslu_notrans": dict(tx=64, trans=0, static_rslu=True),
    "rslu32": dict(tx=32, trans=1, static_rslu=True),
    "rslu96": dict(tx=96, trans=1, static_rslu=True, vmem=64 * 1024 * 1024),
    "rslu128x2b": dict(tx=128, trans=1, static_rslu=True, steps_per_call=2,
                       vmem=100 * 1024 * 1024),
    "rslu96x2": dict(tx=96, trans=1, static_rslu=True, steps_per_call=2,
                     vmem=80 * 1024 * 1024),
    "rslu32x2": dict(tx=32, trans=1, static_rslu=True, steps_per_call=2,
                     vmem=48 * 1024 * 1024),
    # round 3: deeper chaining (margin 16) — streamed passes per step
    # halve again vs x2; the margin-recompute overhead (1 + 2*16/tx)
    # argues for larger tiles
    "rslu64x4": dict(tx=64, trans=1, static_rslu=True, steps_per_call=4,
                     vmem=80 * 1024 * 1024),
    "rslu128x4": dict(tx=128, trans=1, static_rslu=True, steps_per_call=4,
                      vmem=110 * 1024 * 1024),
    "rslu256x4": dict(tx=256, trans=1, static_rslu=True, steps_per_call=4,
                      vmem=120 * 1024 * 1024),
    "rslu256x2": dict(tx=256, trans=1, static_rslu=True, steps_per_call=2,
                      vmem=110 * 1024 * 1024),
    # round 3: single stacked state window per tile (1 in + 1 out DMA
    # instead of 12 — per-window setup dominates the copy floor)
    "stacked64x2": dict(tx=64, trans=1, static_rslu=True,
                        steps_per_call=2, vmem=64 * 1024 * 1024,
                        stacked=True),
    # round 3: tx=80 — margin redundancy 1.2 vs 1.25 at 64, between
    # the known-good 64 and the known-slower 96
    "rslu80x2": dict(tx=80, trans=1, static_rslu=True, steps_per_call=2,
                     vmem=72 * 1024 * 1024),
    # round 3: momentum divides -> approx reciprocal + 1 Newton step
    # (div costs +1.9 carriers, rcpn +1.27 — vpu_op_probe.py)
    "rcpn64x2": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                     vmem=64 * 1024 * 1024, rcp_div=True),
    # round 3: 2D (tx x ty) land elision on the real Azov coastline
    "azov_ctl": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                     vmem=64 * 1024 * 1024, mask="azov"),
    "azov512": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                    vmem=80 * 1024 * 1024, mask="azov", ty=512),
    "azov896": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                    vmem=100 * 1024 * 1024, mask="azov", ty=896),
    "azov896x128": dict(tx=128, trans=1, static_rslu=True,
                        steps_per_call=2, vmem=110 * 1024 * 1024,
                        mask="azov", ty=896),
    # round 4: static planes as VMEM-resident const-index blocks (one
    # HBM fetch for the whole scan; per-tile input DMA drops ~40%)
    "respl64x2": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                      vmem=80 * 1024 * 1024, resident_planes=True),
    # round 4: persistent-VMEM megakernel (whole state in VMEM scratch,
    # 1 HBM read + 1 write per 2000-step window)
    "persist64": dict(tx=64, trans=1, static_rslu=True, persistent=True,
                      vmem=120 * 1024 * 1024),
    # round 4: chained-step frame narrowing (step B on 72 rows) — set
    # OCEAN_FUSED_NARROW_CHAIN=1 in the env; variant alias for logs
    "narrow64x2": dict(tx=64, trans=1, static_rslu=True,
                       steps_per_call=2, vmem=64 * 1024 * 1024,
                       narrow_chain=True),
    # round 5: arithmetic reductions. r5ctl = the r4 default (both
    # bit-exact levers OFF); r5eq = elide_sel + q4 (the new fast-mode
    # default); r5all adds share_prev (chained prev-depth reuse via the
    # filter identity, f32 regrouping)
    "r5ctl": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                  elide_sel=False, q4=False),
    "r5eq": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2),
    "r5all": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                  share_prev=True),
    "r5azov": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                   mask="azov", share_prev=True),
    # round 5: approx-recip+Newton on top of the reductions (the divide
    # share grew as the other ops shrank; r3's rcpn was ~neutral)
    "r5rcp": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                  share_prev=True, rcp_div=True),
    # round 5: vmem-cap sweep on the DEFAULT kernel (the fast2d Azov
    # sweep found caps below ~64MB speed Mosaic's schedule up; r4 had
    # measured 64MB costing 10% on the OLD kernel)
    "r5v5": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                 share_prev=True, vmem=48 * 1024 * 1024),
    "r5v4": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                 share_prev=True, vmem=40 * 1024 * 1024),
    "r5v3": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                 share_prev=True, vmem=32 * 1024 * 1024),
    "r5v45": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                  share_prev=True, vmem=44 * 1024 * 1024),
    "r5v35": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                  share_prev=True, vmem=36 * 1024 * 1024),
    "r5v24": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                  share_prev=True, vmem=24 * 1024 * 1024),
    "r5v16": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                  share_prev=True, vmem=16 * 1024 * 1024),
    "r5v20": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                  share_prev=True, vmem=20 * 1024 * 1024),
    # round 5: re-probe the r3/r4 negative levers UNDER the cap (they
    # were measured uncapped or at 64MB, a different Mosaic regime)
    "r5x4": dict(tx=64, trans=1, static_rslu=True, steps_per_call=4,
                 share_prev=True, vmem=36 * 1024 * 1024),
    "r5t32": dict(tx=32, trans=1, static_rslu=True, steps_per_call=2,
                  share_prev=True, vmem=36 * 1024 * 1024),
    "r5t128": dict(tx=128, trans=1, static_rslu=True, steps_per_call=2,
                   share_prev=True, vmem=36 * 1024 * 1024),
    "r5narrow": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                     share_prev=True, vmem=36 * 1024 * 1024,
                     narrow_chain=True),
    "r5stacked": dict(tx=64, trans=1, static_rslu=True,
                      steps_per_call=2, vmem=36 * 1024 * 1024,
                      stacked=True),
    "r5azovv": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                    share_prev=True, vmem=36 * 1024 * 1024,
                    mask="azov"),
    # tx=128 won under the cap (19.4 vs 18.5) — refine around it
    "r5t128v24": dict(tx=128, trans=1, static_rslu=True,
                      steps_per_call=2, share_prev=True,
                      vmem=24 * 1024 * 1024),
    "r5t128v48": dict(tx=128, trans=1, static_rslu=True,
                      steps_per_call=2, share_prev=True,
                      vmem=48 * 1024 * 1024),
    "r5t192": dict(tx=192, trans=1, static_rslu=True, steps_per_call=2,
                   share_prev=True, vmem=36 * 1024 * 1024),
    "r5t256": dict(tx=256, trans=1, static_rslu=True, steps_per_call=2,
                   share_prev=True, vmem=36 * 1024 * 1024),
    "r5t128x4": dict(tx=128, trans=1, static_rslu=True,
                     steps_per_call=4, share_prev=True,
                     vmem=36 * 1024 * 1024),
    "r5t128azov": dict(tx=128, trans=1, static_rslu=True,
                       steps_per_call=2, share_prev=True,
                       vmem=36 * 1024 * 1024, mask="azov"),
    "r5t384": dict(tx=384, trans=1, static_rslu=True, steps_per_call=2,
                   share_prev=True, vmem=36 * 1024 * 1024),
    "r5t384v48": dict(tx=384, trans=1, static_rslu=True,
                      steps_per_call=2, share_prev=True,
                      vmem=48 * 1024 * 1024),
    "r5t512v48": dict(tx=512, trans=1, static_rslu=True,
                      steps_per_call=2, share_prev=True,
                      vmem=48 * 1024 * 1024),
    "r5t512v64": dict(tx=512, trans=1, static_rslu=True,
                      steps_per_call=2, share_prev=True,
                      vmem=64 * 1024 * 1024),
    "r5t256azov": dict(tx=256, trans=1, static_rslu=True,
                       steps_per_call=2, share_prev=True,
                       vmem=36 * 1024 * 1024, mask="azov"),
    "r5t256v32": dict(tx=256, trans=1, static_rslu=True,
                      steps_per_call=2, share_prev=True,
                      vmem=32 * 1024 * 1024),
    "r5t256v44": dict(tx=256, trans=1, static_rslu=True,
                      steps_per_call=2, share_prev=True,
                      vmem=44 * 1024 * 1024),
    "r5t256b": dict(tx=256, trans=1, static_rslu=True,
                    steps_per_call=2, share_prev=True,
                    vmem=36 * 1024 * 1024),
    # 2D (tx x ty) lane tiling on Azov UNDER the cap (the r3 compile
    # hang may have been the uncapped pathology, like fast2d's)
    "r5azov896": dict(tx=64, trans=1, static_rslu=True,
                      steps_per_call=2, share_prev=True,
                      vmem=36 * 1024 * 1024, mask="azov", ty=896),
    "r5azov512": dict(tx=64, trans=1, static_rslu=True,
                      steps_per_call=2, share_prev=True,
                      vmem=36 * 1024 * 1024, mask="azov", ty=512),
    "r5respl": dict(tx=64, trans=1, static_rslu=True, steps_per_call=2,
                    vmem=36 * 1024 * 1024, resident_planes=True),
    "r5t256x4": dict(tx=256, trans=1, static_rslu=True,
                     steps_per_call=4, share_prev=True,
                     vmem=48 * 1024 * 1024),
}


def main():
    enable_compilation_cache()
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        try:
            bench_variant(n, **VARIANTS[n])
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{n:10s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
