from omg_tpu.parallel import mesh, sharding  # noqa: F401
