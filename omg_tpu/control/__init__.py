from omg_tpu.control import p2p, regions  # noqa: F401
