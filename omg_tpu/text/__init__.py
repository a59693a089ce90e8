from omg_tpu.text import tokenizer  # noqa: F401
