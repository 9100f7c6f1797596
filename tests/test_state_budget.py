"""Composition-state HBM hygiene (pipelines/base.py).

The LRU count bound alone is HBM-blind: entry size scales with bucket x
resolution, and retained big-bucket entries next to full-size params OOMed
the r2r SDXL hybrid prewarm on the 16 GB chip.  Two guards:
CacheConfig.comp_state_bytes (byte-budget eviction, newest always kept) and
release_serving_state() between prewarm iterations.
"""

import numpy as np

from sduss_tpu.config import CacheConfig, Config, ModelConfig
from sduss_tpu.pipelines import build_pipeline
from sduss_tpu.request import Request, SamplingParams


def make_pipe(**cache_kw):
    config = Config()
    config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    config.cache = CacheConfig(enabled=True, mode="compact", **cache_kw)
    return build_pipeline(config)


def _req(i):
    return Request(f"r{i}", SamplingParams(prompt="p", resolution=256,
                                           num_inference_steps=2, seed=i))


class TestStateBudget:
    def test_byte_budget_evicts_oldest(self):
        import jax.numpy as jnp

        pipe = make_pipe(comp_state_lru=8, comp_state_bytes=10 * 4 * 100)

        def mk_state(n):  # 4000 bytes per entry (f32 10x100)
            return {"out": jnp.zeros((10, 100), jnp.float32)}

        for i in range(4):
            pipe._comp_state_entry("t", 256, [_req(i)], 1, (), mk_state)
        # budget fits one entry (4000 bytes) -> older ones evicted
        assert len(pipe._comp_state) == 1
        (key,) = pipe._comp_state
        assert key[3] == ("r3",)

    def test_newest_entry_always_kept_even_over_budget(self):
        import jax.numpy as jnp

        pipe = make_pipe(comp_state_lru=8, comp_state_bytes=1)

        def mk_state(n):
            return {"out": jnp.zeros((10, 100), jnp.float32)}

        e = pipe._comp_state_entry("t", 256, [_req(0)], 1, (), mk_state)
        assert len(pipe._comp_state) == 1 and e is not None

    def test_release_serving_state_clears_stores(self):
        import jax.numpy as jnp

        pipe = make_pipe()
        pipe._comp_state_entry("t", 256, [_req(0)], 1, (),
                               lambda n: {"x": jnp.zeros((2,))})
        pipe._sd3_state = {"k": 1}
        pipe.release_serving_state()
        assert len(pipe._comp_state) == 0
        assert len(pipe._sd3_state) == 0
