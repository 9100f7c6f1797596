"""HTTP API server (aiohttp) — reference entrypoints/api_server.py:23-126.

Endpoints:
  POST /generate  {"prompt": ..., "negative_prompt": ..., "resolution": ...,
                   "num_inference_steps": ..., "guidance_scale": ..., "seed": ...}
                  -> {"request_id", "latency_s", "image_base64"(png), ...}
  GET  /health    -> 200 when the engine loop is alive
  GET  /stats     -> engine metrics summary
  POST /abort     {"request_id": ...}
  POST /clear     -> drain and shut down (reference :100-126)

fastapi/uvicorn are not in this image; aiohttp serves the same surface.
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import io
import time
from typing import Optional

from sduss_tpu.engine.arg_utils import add_engine_args, config_from_args
from sduss_tpu.engine.async_engine import AsyncEngine
from sduss_tpu.logger import init_logger
from sduss_tpu.request import SamplingParams

logger = init_logger(__name__)


def _encode_png(image) -> Optional[str]:
    if image is None:
        return None
    try:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(image).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()
    except ImportError:  # pragma: no cover
        return base64.b64encode(image.tobytes()).decode()


def device_stats() -> list:
    """Per-device HBM usage (the SmUtilMonitor analog, reference
    engine/utils.py:34-118 — there a stubbed nvidia-smi sampler subprocess;
    here a direct runtime query)."""
    import jax

    out = []
    # local devices: in a multi-host world each host's server reports the
    # devices its own engine process can address
    for d in jax.local_devices():
        row = {"id": d.id, "platform": d.platform}
        try:
            ms = d.memory_stats() or {}
            row["bytes_in_use"] = ms.get("bytes_in_use")
            row["bytes_limit"] = ms.get("bytes_limit")
            if ms.get("bytes_limit"):
                row["hbm_utilization"] = round(
                    ms.get("bytes_in_use", 0) / ms["bytes_limit"], 4)
        except Exception:
            pass
        out.append(row)
    return out


def build_app(engine: AsyncEngine):
    from aiohttp import web

    app = web.Application(client_max_size=16 * 2**20)

    async def generate(request: web.Request) -> web.Response:
        body = await request.json()
        try:
            params = SamplingParams(
                prompt=body["prompt"],
                negative_prompt=body.get("negative_prompt", ""),
                resolution=int(body.get("resolution", 512)),
                num_inference_steps=int(body.get("num_inference_steps", 50)),
                guidance_scale=body.get("guidance_scale"),
                seed=body.get("seed"),
            )
            deadline = None
            if body.get("deadline_s") is not None:
                deadline = time.time() + float(body["deadline_s"])
        except (KeyError, ValueError, TypeError) as e:
            return web.json_response({"error": str(e)}, status=400)
        t0 = time.time()
        out = await engine.generate(params, request_id=body.get("request_id"),
                                    deadline=deadline)
        resp = {
            "request_id": out.request_id,
            "finished": out.finished,
            "aborted": out.aborted,
            "latency_s": time.time() - t0,
            "e2e_latency_s": out.e2e_latency_s,
            "resolution": out.resolution,
            "nsfw_flagged": out.nsfw_flagged,
        }
        if body.get("return_image", True):
            resp["image_base64"] = _encode_png(out.image)
        if out.error:
            resp["error"] = out.error
        return web.json_response(resp)

    async def health(request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def stats(request: web.Request) -> web.Response:
        out = engine.engine.stats.summary(
            engine.config.model.family, engine.config.scheduler.slo_scale)
        out["devices"] = device_stats()
        return web.json_response(out)

    async def abort(request: web.Request) -> web.Response:
        body = await request.json()
        await engine.abort(body["request_id"])
        return web.json_response({"status": "aborted"})

    async def clear(request: web.Request) -> web.Response:
        while engine.engine.has_unfinished_requests():
            await asyncio.sleep(0.05)
        await engine.stop()
        asyncio.get_event_loop().call_later(0.2, _shutdown, app)
        return web.json_response({"status": "cleared"})

    app.router.add_post("/generate", generate)
    app.router.add_get("/health", health)
    app.router.add_get("/stats", stats)
    app.router.add_post("/abort", abort)
    app.router.add_post("/clear", clear)
    return app


def _shutdown(app) -> None:  # pragma: no cover
    import signal
    import os

    os.kill(os.getpid(), signal.SIGINT)


def main() -> None:  # pragma: no cover
    from aiohttp import web

    parser = argparse.ArgumentParser("sduss_tpu api server")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    add_engine_args(parser)
    args = parser.parse_args()
    config = config_from_args(args)
    engine = AsyncEngine(config)

    async def on_startup(app):
        engine.start()

    app = build_app(engine)
    app.on_startup.append(on_startup)
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":  # pragma: no cover
    main()
