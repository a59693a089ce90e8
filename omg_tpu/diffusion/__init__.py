from omg_tpu.diffusion import schedulers, sampling  # noqa: F401
