"""AsyncEngine + HTTP surface tests (in-process aiohttp client).

Covers the reference's HTTP smoke clients (tests/entrypoints/
api_server_sd15_multi.py) without sockets or subprocesses.
"""

import asyncio

import numpy as np
import pytest

from sduss_tpu.config import Config, ModelConfig
from sduss_tpu.engine.async_engine import AsyncEngine
from sduss_tpu.request import SamplingParams


def tiny_config():
    c = Config()
    c.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
    return c


class TestAsyncEngine:
    def test_generate_and_stats(self):
        async def main():
            eng = AsyncEngine(tiny_config())
            try:
                out = await eng.generate(SamplingParams(
                    prompt="a cat", resolution=256, num_inference_steps=2))
                assert out.finished and not out.aborted
                assert out.image is not None
                s = eng.engine.stats.summary("sd15", 5.0)
                assert s["finished"] == 1
            finally:
                await eng.stop()

        asyncio.run(main())

    def test_concurrent_requests(self):
        async def main():
            eng = AsyncEngine(tiny_config())
            try:
                outs = await asyncio.gather(*[
                    eng.generate(SamplingParams(prompt=f"p{i}", resolution=256,
                                                num_inference_steps=2, seed=i))
                    for i in range(3)
                ])
                assert all(o.finished for o in outs)
                assert len({o.request_id for o in outs}) == 3
            finally:
                await eng.stop()

        asyncio.run(main())

    def test_add_request_serialized_with_step(self):
        """Arrivals route through the engine-step executor thread: Engine
        mutates _waiting non-atomically inside step(), so an append from
        the event-loop thread could be silently dropped mid-step (request
        stuck in _known forever, stream never finishing)."""
        import threading

        async def main():
            eng = AsyncEngine(tiny_config())
            seen = []
            real = eng.engine.add_request

            def spy(*a, **k):
                seen.append(threading.current_thread().name)
                return real(*a, **k)

            eng.engine.add_request = spy
            try:
                out = await eng.generate(SamplingParams(
                    prompt="t", resolution=256, num_inference_steps=2))
                assert out.finished
                assert seen and all(n.startswith("engine-step")
                                    for n in seen), seen
            finally:
                await eng.stop()

        asyncio.run(main())

    def test_user_abort_counts_in_stats(self):
        """API-initiated aborts flow into EngineStats like scheduler
        aborts, so arrived == finished + aborted."""
        async def main():
            eng = AsyncEngine(tiny_config())
            try:
                stream = await eng.add_request(SamplingParams(
                    prompt="x", resolution=256, num_inference_steps=50),
                    request_id="ab-1")
                await eng.abort("ab-1")
                s = eng.engine.stats.summary("sd15", 5.0)
                assert s["aborted"] >= 1
                del stream
            finally:
                await eng.stop()

        asyncio.run(main())

    def test_abort_waiting_request(self):
        async def main():
            eng = AsyncEngine(tiny_config())
            try:
                stream = await eng.add_request(SamplingParams(
                    prompt="x", resolution=256, num_inference_steps=50),
                    request_id="victim")
                await eng.abort("victim")
                final = None
                async for out in stream:
                    final = out
                assert final is not None and final.aborted
            finally:
                await eng.stop()

        asyncio.run(main())


class TestHttpHandlers:
    def test_generate_health_stats(self):
        aiohttp = pytest.importorskip("aiohttp")
        from aiohttp.test_utils import TestClient, TestServer

        from sduss_tpu.entrypoints.api_server import build_app

        async def main():
            eng = AsyncEngine(tiny_config())
            app = build_app(eng)
            client = TestClient(TestServer(app))
            await client.start_server()
            try:
                r = await client.get("/health")
                assert r.status == 200

                r = await client.post("/generate", json={
                    "prompt": "a cat", "resolution": 256,
                    "num_inference_steps": 2, "return_image": True})
                body = await r.json()
                assert r.status == 200
                assert body["finished"] and body.get("image_base64")

                r = await client.get("/stats")
                s = await r.json()
                assert s["finished"] == 1
                assert "devices" in s

                r = await client.post("/generate", json={"resolution": 256})
                assert r.status == 400  # missing prompt
            finally:
                await client.close()
                await eng.stop()

        asyncio.run(main())
