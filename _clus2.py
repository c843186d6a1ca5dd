import time
import jax, jax.numpy as jnp, numpy as np
import real_time_path_tracing_with_spatiotemporal_filtering_tpu as ptsf
import real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace as pp
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import procedural
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import Scene, Camera, Light, precompute_triangle_data

cam, light = Camera.default(), Light.default()
cfg = ptsf.RenderConfig(width=1920, height=1080)
scene = Scene.from_arrays(*procedural.subdivided_cornell(4))
for cs in (16, 32, 64):
    pp.CLUSTER_SIZE = cs
    td = precompute_triangle_data(scene)
    fn = jax.jit(lambda f, td=td: pp.path_trace_pass_pallas(td, cam.position, light, f, cfg, planar=True))
    out = fn(jnp.int32(1)); np.asarray(out[0][0,0])
    t0=time.perf_counter()
    for i in range(8): out = fn(jnp.int32(i))
    np.asarray(out[0][0,0])
    print(f"CLUSTER_SIZE={cs}: {(time.perf_counter()-t0)/8*1000:.1f} ms ({td.cluster_aabbs.shape[0]} clusters)", flush=True)
