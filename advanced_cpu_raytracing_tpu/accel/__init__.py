from advanced_cpu_raytracing_tpu.accel.bvh import build_bvh, FlatBVH  # noqa: F401
