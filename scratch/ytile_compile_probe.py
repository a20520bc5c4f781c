import sys, time
sys.path.insert(0, ".")
import jax, numpy as np
from ocean_model_arch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from ocean_model_arch_tpu.config import ModelConfig, Precision, SWConfig, basinpar_flat
from ocean_model_arch_tpu.core.grid import build_grid
from ocean_model_arch_tpu.core.masks import frame_of_land_mask
from ocean_model_arch_tpu.model.init import init_ocean_state
from ocean_model_arch_tpu.model.fused import FusedSWModel

guard = len(sys.argv) > 1 and sys.argv[1] == "guard"
nx, ny = 128, 300
basin = basinpar_flat(nx, ny, curve_grid=1, rlon=27.5, rlat=41.0)
cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=0), precision=Precision.f32())
grid = build_grid(basin, frame_of_land_mask(nx, ny), precision=cfg.precision)
state = init_ocean_state(grid, cfg)
fm = FusedSWModel(grid, cfg, 1.0, tx=64, static_rslu=True, steps_per_call=2,
                  ty=128, my=128, tile_guard=guard)
s6 = fm.pack(state)
f, t = jax.jit(fm.step6)(*s6)
jax.block_until_ready(t)
print("COMPILED+RAN OK, guard =", guard)
