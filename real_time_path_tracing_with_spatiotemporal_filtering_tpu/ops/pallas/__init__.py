"""Pallas TPU kernels for the hot passes.

The XLA formulations (ops/pathtrace.py, ops/atrous.py) materialize per-bounce
(N, T) interaction tables and whole-image taps in HBM; these kernels keep the
entire loop state in VMEM/registers -- the path tracer runs all <=32 bounces
x T triangles per pixel tile without touching HBM until the final radiance
write, with scene constants in SMEM and pixels mapped to vector lanes.
"""
