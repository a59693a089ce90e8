from omg_tpu.pipelines import sdxl, multiconcept  # noqa: F401
