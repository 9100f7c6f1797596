"""Offline batch API (reference entrypoints/diffusion_pipeline.py:14-104)."""

from __future__ import annotations

import uuid
from typing import List, Optional, Sequence, Union

from sduss_tpu.config import Config, ModelConfig
from sduss_tpu.engine.engine import Engine
from sduss_tpu.request import RequestOutput, SamplingParams


class DiffusionPipeline:
    """Synchronous offline generation driving the full engine stack."""

    def __init__(self, model: str = "sd15", *, config: Optional[Config] = None, **kwargs):
        if config is None:
            config = Config()
            config.model = ModelConfig(model=model, **{
                k: v for k, v in kwargs.items()
                if k in ("model_path", "dtype", "seed", "test_tiny", "use_patched")})
            if "policy" in kwargs:
                config.scheduler.policy = kwargs["policy"]
            if "max_batch_size" in kwargs:
                config.scheduler.max_batch_size = kwargs["max_batch_size"]
            if "dp" in kwargs:
                config.parallel.dp = kwargs["dp"]
        self.config = config
        self.engine = Engine(config)

    def generate(
        self,
        prompts: Union[str, Sequence[str]],
        negative_prompt: str = "",
        resolution: Union[int, Sequence[int]] = 512,
        num_inference_steps: int = 50,
        guidance_scale: Optional[float] = None,
        seed: Optional[int] = None,
        output_type: str = "np",
    ) -> List[RequestOutput]:
        if isinstance(prompts, str):
            prompts = [prompts]
        if isinstance(resolution, int):
            resolution = [resolution] * len(prompts)
        order: dict = {}
        for i, (p, res) in enumerate(zip(prompts, resolution)):
            rid = f"offline-{uuid.uuid4().hex[:8]}-{i}"
            order[rid] = i
            self.engine.add_request(
                rid,
                SamplingParams(
                    prompt=p, negative_prompt=negative_prompt, resolution=res,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale,
                    seed=None if seed is None else seed + i,
                    output_type=output_type))
        outputs: List[RequestOutput] = []
        while self.engine.has_unfinished_requests():
            outputs.extend(self.engine.step())
        # results in PROMPT order (ids carry a random uuid, so sorting by id
        # would shuffle outputs relative to the inputs)
        outputs.sort(key=lambda o: order.get(o.request_id, len(order)))
        if self.config.engine.collect_data:
            self.engine.dump_data()
        return outputs
