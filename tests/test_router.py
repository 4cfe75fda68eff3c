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


def test_router_efficiency_under_saturated_backends():
    """The >=85% scaling bar's ACTUAL failure mode is routing under queueing
    and SSE fan-out at a saturated backend — not idle-CPU headroom (the
    benchmark_scaling CPU numbers exceeded 100% for that reason, PERF.md).
    Here each backend has a hard token-rate cap and a bounded slot count, the
    client oversubscribes 2x, and the router must still deliver >=85% of the
    backends' combined capacity."""
    RATE = 400.0      # tokens/s per backend (hard cap)
    SLOTS = 8         # concurrent streams per backend
    TOKENS = 40       # per request
    N_BACK = 2
    OVERSUB = 2       # 2x more streams than total slots

    def make_throttled(name):
        app = web.Application()
        sem = asyncio.Semaphore(SLOTS)

        async def health(request):
            return web.json_response({"status": "healthy", "backend": name})

        async def chat(request):
            await request.json()
            async with sem:  # bounded batch: extras queue (backpressure)
                resp = web.StreamResponse()
                resp.headers["Content-Type"] = "text/event-stream"
                await resp.prepare(request)
                interval = SLOTS / RATE  # each slot emits RATE/SLOTS tok/s
                for i in range(TOKENS):
                    await asyncio.sleep(interval)
                    await resp.write(
                        f"data: {json.dumps({'b': name, 'i': i})}\n\n".encode())
                await resp.write(b"data: [DONE]\n\n")
                await resp.write_eof()
                return resp

        app.router.add_get("/health", health)
        app.router.add_post("/v1/chat/completions", chat)
        return app

    loop = asyncio.new_event_loop()
    servers = [TestServer(make_throttled(f"b{i}")) for i in range(N_BACK)]
    for s in servers:
        loop.run_until_complete(s.start_server())
    urls = [f"http://{s.host}:{s.port}" for s in servers]
    router = TestClient(TestServer(create_router_app(urls)), loop=loop)
    loop.run_until_complete(router.start_server())

    async def one(i, counts):
        body = {"stream": True, "messages": [], "model": "m"}
        async with router.post("/v1/chat/completions", json=body) as resp:
            while True:
                raw = await resp.content.readline()
                if not raw:
                    break
                if raw.startswith(b"data: ") and b"[DONE]" not in raw:
                    counts[0] += 1

    async def go():
        import time
        n_streams = N_BACK * SLOTS * OVERSUB
        counts = [0]
        t0 = time.time()
        await asyncio.gather(*[one(i, counts) for i in range(n_streams)])
        return counts[0] / (time.time() - t0)

    try:
        tps = loop.run_until_complete(asyncio.wait_for(go(), 120))
        capacity = N_BACK * RATE
        eff = tps / capacity
        # >=85%: the router + proxy layer may not eat more than 15% of a
        # SATURATED backend pool's throughput (queueing, fan-out, SSE relay)
        assert eff >= 0.85, f"router efficiency {eff:.2%} below 85% bar"
    finally:
        loop.run_until_complete(router.close())
        for s in servers:
            loop.run_until_complete(s.close())
        loop.close()
