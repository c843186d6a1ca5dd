"""Device-side building blocks (pure jnp / Pallas).

Each module mirrors one algorithmic concern of the reference's GLSL kernels,
re-expressed as vectorized array programs:

    rng          -- PCG hash RNG (raytrace.comp.glsl:71-92)
    camera       -- pinhole rays, lookAt/perspective, worldToPixel
    intersect    -- ray/triangle + ray/sphere; brute-force nearest hit
    shading      -- sky, normal-keyed albedo, Phong (temporalGradient:71-101)
    barycentric  -- area barycentrics (temporalGradient.comp.glsl:50-69)
    gbuffer      -- primary-ray visibility pass (replaces visibility.*)
    pathtrace    -- bounce loop (raytrace.comp.glsl:200-271)
    gradient     -- temporal gradient lambda (temporalGradient.comp.glsl)
    atrous       -- a-trous filter + temporal EMA (temporalFiltering.comp.glsl)
"""
