from omg_tpu.utils import profiling  # noqa: F401
