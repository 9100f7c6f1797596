"""Minimal HTTP client (reference examples/api_client.py)."""

from __future__ import annotations

import argparse
import asyncio
import json


async def generate(url: str, prompt: str, resolution: int, steps: int,
                   want_image: bool = False) -> dict:
    import aiohttp

    async with aiohttp.ClientSession() as session:
        async with session.post(f"{url}/generate", json={
            "prompt": prompt, "resolution": resolution,
            "num_inference_steps": steps, "return_image": want_image,
        }) as resp:
            return await resp.json()


def main() -> None:  # pragma: no cover
    p = argparse.ArgumentParser("sduss_tpu client")
    p.add_argument("--url", default="http://localhost:8000")
    p.add_argument("--prompt", default="a photograph of an astronaut riding a horse")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--save", default=None, help="write the PNG here")
    args = p.parse_args()
    out = asyncio.run(generate(args.url, args.prompt, args.resolution,
                               args.steps, want_image=args.save is not None))
    if args.save and out.get("image_base64"):
        import base64

        with open(args.save, "wb") as f:
            f.write(base64.b64decode(out.pop("image_base64")))
        out["saved_to"] = args.save
    print(json.dumps(out, indent=2))


if __name__ == "__main__":  # pragma: no cover
    main()
