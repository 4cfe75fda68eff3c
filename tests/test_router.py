"""Multi-host DP router tests: least-loaded fan-out, SSE pass-through, failover,
aggregate health — over real aiohttp servers acting as backends."""

import asyncio
import json

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from chirrup_tpu.server.router import create_router_app


def _make_backend(name: str) -> web.Application:
    app = web.Application()
    state = {"requests": 0}

    async def health(request):
        return web.json_response({"status": "healthy", "backend": name})

    async def chat(request):
        state["requests"] += 1
        body = await request.json()
        if body.get("stream"):
            resp = web.StreamResponse()
            resp.headers["Content-Type"] = "text/event-stream"
            await resp.prepare(request)
            for i in range(3):
                chunk = {"backend": name, "i": i}
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp
        return web.json_response({"backend": name, "echo": body})

    app.router.add_get("/health", health)
    app.router.add_post("/v1/chat/completions", chat)
    app["state"] = state
    return app


@pytest.fixture()
def router_setup():
    loop = asyncio.new_event_loop()
    backends = [_make_backend("b0"), _make_backend("b1")]
    servers = [TestServer(b) for b in backends]
    for s in servers:
        loop.run_until_complete(s.start_server())
    urls = [f"http://{s.host}:{s.port}" for s in servers]
    app = create_router_app(urls)
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    yield loop, client, backends, servers, app
    loop.run_until_complete(client.close())
    for s in servers:
        loop.run_until_complete(s.close())
    loop.close()


def _run(loop, coro, timeout=60):
    return loop.run_until_complete(asyncio.wait_for(coro, timeout))


def test_proxy_non_streaming_and_balance(router_setup):
    loop, client, backends, _, _ = router_setup

    async def go():
        hits = []
        for i in range(6):
            resp = await client.post("/v1/chat/completions",
                                     json={"prompt": i})
            assert resp.status == 200
            hits.append((await resp.json())["backend"])
        return hits

    hits = _run(loop, go())
    # all requests answered, both backends participate (least-loaded with
    # sequential requests round-robins by fail_count/inflight ties)
    assert set(hits) <= {"b0", "b1"}
    assert backends[0]["state"]["requests"] + backends[1]["state"]["requests"] == 6


def test_proxy_streaming_sse(router_setup):
    loop, client, _, _, _ = router_setup

    async def go():
        resp = await client.post("/v1/chat/completions",
                                 json={"stream": True})
        assert resp.status == 200
        body = (await resp.read()).decode()
        return body

    body = _run(loop, go())
    assert body.count("data: ") == 4
    assert "data: [DONE]" in body


def test_failover_to_healthy_backend(router_setup):
    loop, client, backends, servers, app = router_setup

    async def go():
        # kill backend 0; router must fail over transparently
        await servers[0].close()
        results = []
        for _ in range(4):
            resp = await client.post("/v1/chat/completions", json={})
            results.append((resp.status, (await resp.json())))
        return results

    results = _run(loop, go())
    assert all(status == 200 for status, _ in results)
    assert all(body["backend"] == "b1" for _, body in results)


def test_aggregate_health(router_setup):
    loop, client, _, servers, _ = router_setup

    async def go():
        resp = await client.get("/health")
        return resp.status, await resp.json()

    status, body = _run(loop, go())
    assert status == 200
    assert body["healthy_count"] == 2

    async def go2():
        await servers[1].close()
        resp = await client.get("/health")
        return resp.status, await resp.json()

    status2, body2 = _run(loop, go2())
    assert body2["healthy_count"] == 1
