"""Engine-level parallelism wiring tests: tensor_parallel and per-device worker
placement must be reachable from the public entry points (ServerConfig ->
AsyncEngineCore.init -> build_model_factory -> ServingModel(mesh=...)), not just
from the parallel/ library (round-1 gap: the knob parsed but was never read)."""

import asyncio

import jax
import pytest

from chirrup_tpu.engine.engine import AsyncEngineCore
from chirrup_tpu.engine.structures import ModelLoadConfig

from tests.engine_fixtures import write_tiny_vocab, synthetic_model_config


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    return write_tiny_vocab(str(tmp_path_factory.mktemp("vocab") / "vocab.txt"))


def _init_engine(cfg, worker_num=1, batch_size=4):
    loop = asyncio.new_event_loop()
    engine = AsyncEngineCore()
    loop.run_until_complete(asyncio.wait_for(
        engine.init(worker_num=worker_num, model_config=cfg,
                    batch_size=batch_size, load_timeout=180), timeout=200))
    return loop, engine


def _complete(loop, engine, prompt="hello world", **kw):
    async def go():
        completion = engine.completion(
            prompt, temperature=0.0, max_tokens=4, stop_tokens=[0],
            presence_penalty=0.0, frequency_penalty=0.0, **kw)
        return [e[1] async for e in completion if e[0] == "token"]

    return loop.run_until_complete(asyncio.wait_for(go(), 120))


def _shutdown(loop, engine):
    engine.shutdown()
    engine.join(timeout=10)
    loop.close()


@pytest.mark.parametrize("tp", [2, 8])
def test_tp_engine_completion(vocab_path, cpu_devices, tp):
    """A completion served through AsyncEngineCore.init over a tp-device mesh.
    n_embd = 64 heads * tp keeps heads divisible by tp."""
    # vocab 320 (not the fixture's 300): the column-parallel head shards V over
    # tp, so V % tp == 0 — always true for the real 65536 vocab
    cfg = synthetic_model_config(
        vocab_path, tensor_parallel=tp,
        synthetic_config=dict(n_layer=2, n_embd=64 * tp, vocab_size=320,
                              d_decay_lora=32, d_iclr_lora=32, d_v_lora=16,
                              d_gate_lora=32))
    loop, engine = _init_engine(cfg)
    try:
        # the worker's model must actually be sharded over a tp-axis mesh
        model = engine.workers[0].model
        assert model.mesh is not None
        assert model.mesh.shape["tp"] == tp
        emb_devices = model.params["emb"].sharding.device_set
        assert len(emb_devices) == tp  # replicated over the tp mesh devices

        tokens = _complete(loop, engine)
        assert 1 <= len(tokens) <= 4
    finally:
        _shutdown(loop, engine)


def test_tp_greedy_matches_single_device(vocab_path, cpu_devices):
    """Greedy tokens through a tp=2 engine equal the tp=1 engine's (same seed)."""
    results = {}
    prompt = "hello world the User says hello"
    for tp in (1, 2):
        cfg = synthetic_model_config(
            vocab_path, tensor_parallel=tp,
            synthetic_config=dict(n_layer=2, n_embd=128, vocab_size=300,
                                  d_decay_lora=32, d_iclr_lora=32, d_v_lora=16,
                                  d_gate_lora=32))
        loop, engine = _init_engine(cfg)
        try:
            results[tp] = _complete(loop, engine, prompt=prompt)
        finally:
            _shutdown(loop, engine)
    assert results[1] == results[2]
    assert len(results[1]) >= 1


def test_dp_workers_pinned_to_distinct_devices(vocab_path, cpu_devices):
    """worker_num=2 must place each worker's replica on its own device
    (reference: torch.cuda.set_device(gpu_id[0]), chirrup/worker.py:252-257)."""
    cfg = synthetic_model_config(vocab_path)
    loop, engine = _init_engine(cfg, worker_num=2)
    try:
        placements = []
        for w in engine.workers:
            devs = w.model.params["emb"].sharding.device_set
            assert len(devs) == 1
            placements.append(next(iter(devs)))
        assert placements[0] != placements[1]

        # both workers serve: 3 concurrent completions drain through the shared
        # queue with no stalls
        async def go():
            comps = [engine.completion(f"hello {i}", temperature=0.0,
                                       max_tokens=3, stop_tokens=[0],
                                       presence_penalty=0.0,
                                       frequency_penalty=0.0)
                     for i in range(3)]
            return await asyncio.gather(
                *[c.get_full_completion() for c in comps])

        texts = loop.run_until_complete(asyncio.wait_for(go(), 120))
        assert len(texts) == 3
    finally:
        _shutdown(loop, engine)


def test_server_config_reaches_model_load_config():
    """Regression for the round-1 dead knob: ServerConfig.tensor_parallel must
    flow into ModelLoadConfig."""
    from chirrup_tpu.server.app import _model_config_from_server_config
    from chirrup_tpu.server.config import ServerConfig

    sc = ServerConfig(tensor_parallel=4, synthetic_model="2,128",
                      vocab_path="/dev/null")
    mc = _model_config_from_server_config(sc)
    assert isinstance(mc, ModelLoadConfig)
    assert mc.tensor_parallel == 4


def test_lockstep_engine_single_process(vocab_path, cpu_devices):
    """Lockstep mode through the public engine API on one process (dp=1): the
    worker runs the fixed program sequence (batched admission + always-on
    decode blocks + periodic prefill) and still serves correct completions.
    The 2-process version runs in scripts/dryrun_multihost.py."""
    cfg = synthetic_model_config(
        vocab_path, tensor_parallel=2, lockstep=True,
        synthetic_config=dict(n_layer=2, n_embd=128, vocab_size=320,
                              d_decay_lora=32, d_iclr_lora=32, d_v_lora=16,
                              d_gate_lora=32))
    loop, engine = _init_engine(cfg, batch_size=4)
    try:
        w = engine.workers[0]
        assert w.lockstep and w.slot_range == (0, 4)
        assert w.model.mesh is not None

        tokens = _complete(loop, engine, prompt="hello world the User")
        assert 1 <= len(tokens) <= 4

        # a second request (exercises slot reuse through the batched insert,
        # which zeroes the freed slot's state)
        tokens2 = _complete(loop, engine, prompt="hello world the User")
        assert tokens2 == tokens  # greedy + fresh zero state => identical
    finally:
        _shutdown(loop, engine)


def test_tp2_matches_tp1_on_exact_tpu_stack(vocab_path, cpu_devices):
    """tp=2 vs tp=1 greedy equality on the EXACT TPU numeric stack — int8
    fused pallas_a8 kernels + Pallas WKV, interpret mode — through
    AsyncEngineCore (VERDICT r2 golden-coverage gap (c); test_parallel.py
    covers the same at the ServingModel level only)."""
    results = {}
    prompt = "hello world the User says hello"
    for tp in (1, 2):
        cfg = synthetic_model_config(
            vocab_path, tensor_parallel=tp, quantization="int8",
            use_pallas_wkv=True, interpret_pallas=True, mm8_core="pallas_a8",
            activation_dtype="float32", wkv_state_dtype="float32",
            synthetic_config=dict(n_layer=2, n_embd=128, vocab_size=320,
                                  d_decay_lora=32, d_iclr_lora=32,
                                  d_v_lora=16, d_gate_lora=32))
        loop, engine = _init_engine(cfg)
        try:
            model = engine.workers[0].model
            from chirrup_tpu.ops.mm8 import Mm8MultiWeight
            assert isinstance(model.params["blocks"]["att"].get("Wrkv"),
                              Mm8MultiWeight)  # the fused serving layout
            results[tp] = _complete(loop, engine, prompt=prompt)
        finally:
            _shutdown(loop, engine)
    # per-chip activation-quant scales differ under tp, so logits differ at
    # ~1e-2 rel — but greedy token decisions must agree on this fixture
    assert results[1] == results[2]
    assert len(results[1]) >= 1
