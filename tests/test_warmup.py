"""AOT warmup compiles the stage programs from shape structs only."""

from omg_tpu.pipelines import sdxl
from omg_tpu.serving import warmup


def test_warmup_tiny():
    cfg = sdxl.tiny_config()
    msgs = []
    n = warmup.warmup(cfg, steps=3, buckets=((32, 32),),
                      concept_counts=(1, 2), log=msgs.append)
    assert n == 4  # 2 cfg-range programs + 2 concept variants
    assert len(msgs) == 1
