import time
import jax, jax.numpy as jnp, numpy as np
import real_time_path_tracing_with_spatiotemporal_filtering_tpu as ptsf
import real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace as pp
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import procedural
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import Scene, Camera, Light, precompute_triangle_data
import dataclasses

cam, light = Camera.default(), Light.default()
cfg = ptsf.RenderConfig(width=1920, height=1080)
for name, splits in [("cornell(32)", 1), ("subdiv2(128)", 2), ("subdiv4(512)", 4)]:
    scene = Scene.from_arrays(*procedural.subdivided_cornell(splits)) if splits > 1 else Scene.cornell_box()
    td = precompute_triangle_data(scene)
    try:
        fn = jax.jit(lambda f, td=td: pp.path_trace_pass_pallas(td, cam.position, light, f, cfg, planar=True))
        out = fn(jnp.int32(1)); np.asarray(out[0][0,0])
        t0=time.perf_counter()
        for i in range(8): out = fn(jnp.int32(i))
        np.asarray(out[0][0,0])
        nc = 0 if td.cluster_aabbs is None else td.cluster_aabbs.shape[0]
        print(f"{name}: {(time.perf_counter()-t0)/8*1000:.1f} ms (pairs {td.pair_table.shape[0]}, clusters {nc})", flush=True)
    except Exception as e:
        print(f"{name} FAIL: {str(e)[:150]}", flush=True)
