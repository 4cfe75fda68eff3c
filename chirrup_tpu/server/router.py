"""Multi-host data-parallel router: one front door over N serving hosts.

The reference scales by data parallelism only — one full model replica per GPU
behind a shared task queue (SURVEY §2.6). The TPU equivalent at pod scale: one
full (tensor-sharded) replica per host, each running `chirrup_tpu.server`
against its own chips, with this router fanning requests across hosts.
Decode work never crosses DCN, so tokens/s scales linearly with hosts (the
≥85% scaling-efficiency target is met by construction; the only shared costs
are HTTP routing and the router's event loop).

Least-loaded routing by in-flight request count, passive health checking with
exponential backoff on failed hosts, and transparent SSE streaming.

    python -m chirrup_tpu.server.router \
        --backends http://host0:8000,http://host1:8000 --port 9000
"""

from __future__ import annotations

import argparse
import asyncio
import time
from typing import List, Optional

import aiohttp
from aiohttp import web

HOP_HEADERS = {"host", "content-length", "transfer-encoding", "connection",
               "keep-alive"}


class Backend:
    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self.inflight = 0
        self.healthy = True
        self.next_retry = 0.0
        self.fail_count = 0

    def mark_failed(self):
        self.fail_count += 1
        self.healthy = False
        self.next_retry = time.time() + min(2.0 ** self.fail_count, 30.0)

    def mark_ok(self):
        self.fail_count = 0
        self.healthy = True


class Router:
    def __init__(self, backends: List[str]):
        self.backends = [Backend(u) for u in backends]
        self.session: Optional[aiohttp.ClientSession] = None

    def pick(self) -> Optional[Backend]:
        now = time.time()
        candidates = [b for b in self.backends
                      if b.healthy or now >= b.next_retry]
        if not candidates:
            return None
        return min(candidates, key=lambda b: (b.inflight, b.fail_count))

    async def proxy(self, request: web.Request) -> web.StreamResponse:
        body = await request.read()
        last_error = None
        for _ in range(len(self.backends)):
            backend = self.pick()
            if backend is None:
                break
            backend.inflight += 1
            try:
                return await self._forward(request, backend, body)
            except (aiohttp.ClientError, asyncio.TimeoutError) as exc:
                backend.mark_failed()
                last_error = exc
            finally:
                backend.inflight -= 1
        return web.json_response(
            {"error": {"message": f"no healthy backend: {last_error}",
                       "type": "router_error", "code": 503}}, status=503)

    async def _forward(self, request: web.Request, backend: Backend,
                       body: bytes) -> web.StreamResponse:
        headers = {k: v for k, v in request.headers.items()
                   if k.lower() not in HOP_HEADERS}
        timeout = aiohttp.ClientTimeout(total=None, sock_connect=10)
        async with self.session.request(
                request.method, backend.url + request.path_qs,
                data=body or None, headers=headers,
                timeout=timeout) as upstream:
            backend.mark_ok()
            resp = web.StreamResponse(status=upstream.status)
            for k, v in upstream.headers.items():
                if k.lower() not in HOP_HEADERS:
                    resp.headers[k] = v
            await resp.prepare(request)
            async for chunk in upstream.content.iter_any():
                await resp.write(chunk)
            await resp.write_eof()
            return resp

    async def health(self, request: web.Request) -> web.Response:
        """Aggregate backend health (actively probes each /health)."""
        results = {}
        for b in self.backends:
            try:
                async with self.session.get(
                        b.url + "/health",
                        timeout=aiohttp.ClientTimeout(total=5)) as r:
                    results[b.url] = {"status": r.status,
                                      "inflight": b.inflight}
                    b.mark_ok()
            except (aiohttp.ClientError, asyncio.TimeoutError) as exc:
                results[b.url] = {"status": f"error: {exc}",
                                  "inflight": b.inflight}
                b.mark_failed()
        healthy = sum(1 for v in results.values() if v["status"] == 200)
        return web.json_response({
            "status": "healthy" if healthy else "unhealthy",
            "backends": results,
            "healthy_count": healthy,
        }, status=200 if healthy else 503)


def create_router_app(backends: List[str]) -> web.Application:
    router = Router(backends)
    app = web.Application()

    async def on_startup(app_):
        router.session = aiohttp.ClientSession()

    async def on_cleanup(app_):
        await router.session.close()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    app.router.add_get("/health", router.health)
    app.router.add_route("*", "/{tail:.*}", router.proxy)
    app["router"] = router
    return app


def main():
    ap = argparse.ArgumentParser(prog="chirrup_tpu.server.router")
    ap.add_argument("--backends", required=True,
                    help="comma-separated backend base URLs")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=9000)
    args = ap.parse_args()
    app = create_router_app([u for u in args.backends.split(",") if u])
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
