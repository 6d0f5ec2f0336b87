"""Server bootstrap: ``python -m easevoice_trainer_tpu.main [--dry-run]``.

Serves the REST app on 0.0.0.0:8000 (reference: src/main.py:10-26); --dry-run
boots the app, binds the port, then exits — the startup smoke check.
"""
from __future__ import annotations

import argparse
import asyncio
import os as _os

# honor JAX_PLATFORMS before anything can initialize a jax backend (with an
# out-of-tree TPU plugin the env var alone is ignored; see cmd/__init__.py)
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

from aiohttp import web

from .rest.app import build_app
from .utils.logger import logger

import os

HOST = "0.0.0.0"
PORT = int(os.environ.get("EASEVOICE_PORT", "8000"))


async def _serve(dry_run: bool) -> None:
    app = build_app()
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, HOST, PORT)
    await site.start()
    logger.info("serving on http://%s:%d", HOST, PORT)
    if dry_run:
        logger.info("dry-run: server started OK, shutting down")
        await runner.cleanup()
        return
    try:
        while True:
            await asyncio.sleep(3600)
    finally:
        await runner.cleanup()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dry-run", action="store_true",
                        help="boot the server, then exit immediately")
    args = parser.parse_args()
    asyncio.run(_serve(args.dry_run))


if __name__ == "__main__":
    main()
