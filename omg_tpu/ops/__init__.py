from omg_tpu.ops import flash_attention  # noqa: F401
