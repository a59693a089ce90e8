from omg_tpu.nn import layers, attention  # noqa: F401
