import sys, time
sys.path.insert(0, ".")
import jax
from ocean_model_arch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
sys.path.insert(0, "scripts")
from fused_variants_probe import bench_variant
for vmem in (64 * 1024 * 1024, None):
    bench_variant(f"rslu64x2/v{vmem and vmem//2**20}", tx=64, trans=1,
                  static_rslu=True, steps_per_call=2, vmem=vmem)
