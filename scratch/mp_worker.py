import sys
proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
jax.distributed.initialize("127.0.0.1:12421", nproc, proc_id)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
devs = jax.devices()
print(f"proc {proc_id}: {len(devs)} global devices, local={jax.local_device_count()}", flush=True)
mesh = Mesh(np.array(devs), ("x",))
local = np.full((1, 4), float(proc_id + 1), np.float32)
arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("x")), local)
out = jax.jit(jax.shard_map(lambda a: jax.lax.psum(a, "x"), mesh=mesh,
                            in_specs=P("x"), out_specs=P()))(arr)
print(f"proc {proc_id}: psum -> {np.asarray(out)[0]}", flush=True)
# ppermute shift (the halo primitive)
sh = jax.jit(jax.shard_map(
    lambda a: jax.lax.ppermute(a, "x", [(i, i+1) for i in range(nproc-1)]),
    mesh=mesh, in_specs=P("x"), out_specs=P("x")))(arr)
print(f"proc {proc_id}: ppermute local -> {np.asarray(jax.experimental.multihost_utils.process_allgather(sh, tiled=True))[:,0]}", flush=True)
