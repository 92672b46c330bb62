from advanced_cpu_raytracing_tpu.parallel.mesh import make_device_mesh  # noqa: F401
