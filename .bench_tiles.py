import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import numpy as np, time
from ocean_model_arch_tpu.config import ModelConfig, Precision, SWConfig, basinpar_as250m_test
from ocean_model_arch_tpu.core.grid import build_grid
from ocean_model_arch_tpu.core.masks import frame_of_land_mask
from ocean_model_arch_tpu.model.init import init_ocean_state
from ocean_model_arch_tpu.model.fused import FusedSWModel

basin = basinpar_as250m_test()
prec = Precision.f32()
cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=0), precision=prec)
grid = build_grid(basin, frame_of_land_mask(basin.nx, basin.ny), precision=prec)
state = init_ocean_state(grid, cfg)
for tx in (48, 96, 112, 64):
    try:
        fm = FusedSWModel(grid, cfg, 1.0, tx=tx)
        s6 = fm.pack(state)
        runj = jax.jit(lambda s: fm.run_steps(s, 50))
        out, ok = runj(s6); jax.block_until_ready(out[0])
        s = out; t0=time.perf_counter()
        for _ in range(4): s, ok = runj(s)
        jax.block_until_ready(s[0]); dt=time.perf_counter()-t0
        print(f"tx={tx}: {basin.nx*basin.ny*200/dt/1e9:.2f} Gpts/s ({dt/200*1e3:.3f} ms/step)", flush=True)
    except Exception as e:
        print(f"tx={tx}: FAIL {str(e)[:150]}", flush=True)
