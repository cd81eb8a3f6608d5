"""HTTP serving front-end tests (rten_tpu/serve.py): in-process server
over a tiny random-weight model, exercised with urllib."""

import json
import threading
import urllib.error
import urllib.request

import jax
import pytest


@pytest.fixture(scope="module")
def server():
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM
    from rten_tpu.serve import serve

    from rten_tpu.generate.sampler import PerRequestSampler

    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    # The real server default: per-request sampling (requests without
    # sampling params decode greedily).
    engine = ServingEngine(model, params, max_batch=2, capacity=64,
                           prefill_buckets=(16,),
                           sampler=PerRequestSampler(max_k=16))
    srv, driver = serve(engine, port=0, burst=1)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()
    driver.stop()
    srv.server_close()


def _post(base, path, payload, timeout=300):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_health_and_models(server):
    with urllib.request.urlopen(server + "/health", timeout=60) as resp:
        assert json.load(resp)["status"] == "ok"
    with urllib.request.urlopen(server + "/v1/models", timeout=60) as resp:
        data = json.load(resp)
    assert data["data"][0]["id"] == "rten-tpu"


def test_completion_basic(server):
    with _post(server, "/v1/completions",
               {"prompt": [1, 2, 3], "max_tokens": 5}) as resp:
        data = json.load(resp)
    choice = data["choices"][0]
    assert len(choice["token_ids"]) == 5
    assert choice["finish_reason"] == "length"
    assert data["usage"] == {"prompt_tokens": 3, "completion_tokens": 5,
                             "total_tokens": 8}
    assert data["metrics"]["tokens_per_s"] > 0


def test_completion_deterministic_across_requests(server):
    results = []
    for _ in range(2):
        with _post(server, "/v1/completions",
                   {"prompt": [7, 8, 9, 10], "max_tokens": 6}) as resp:
            results.append(json.load(resp)["choices"][0]["token_ids"])
    # Greedy sampling: same prompt -> same tokens regardless of slot.
    assert results[0] == results[1]


def test_streaming_matches_non_streaming(server):
    payload = {"prompt": [4, 5, 6], "max_tokens": 4}
    with _post(server, "/v1/completions", payload) as resp:
        full = json.load(resp)["choices"][0]["token_ids"]

    streamed, finish = [], None
    with _post(server, "/v1/completions",
               {**payload, "stream": True}) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            data = line[len("data: "):]
            if data == "[DONE]":
                break
            chunk = json.loads(data)["choices"][0]
            streamed.extend(chunk["token_ids"])
            if chunk.get("finish_reason"):
                finish = chunk["finish_reason"]
    assert streamed == full
    assert finish == "length"


def test_stop_ids(server):
    # Learn the greedy continuation, then stop on its second token.
    with _post(server, "/v1/completions",
               {"prompt": [1, 2, 3], "max_tokens": 5}) as resp:
        tokens = json.load(resp)["choices"][0]["token_ids"]
    stop = tokens[1]
    expected = tokens[:tokens.index(stop) + 1]  # first occurrence wins
    with _post(server, "/v1/completions",
               {"prompt": [1, 2, 3], "max_tokens": 5,
                "stop_ids": [stop]}) as resp:
        data = json.load(resp)["choices"][0]
    assert data["token_ids"] == expected
    assert data["finish_reason"] == "stop"


def test_concurrent_requests_share_batch(server):
    results = {}

    def fetch(name, prompt):
        with _post(server, "/v1/completions",
                   {"prompt": prompt, "max_tokens": 6}) as resp:
            results[name] = json.load(resp)["choices"][0]["token_ids"]

    threads = [threading.Thread(target=fetch, args=(i, [10 + i, 20 + i]))
               for i in range(3)]  # 3 requests > max_batch=2: queueing too
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    assert sorted(results) == [0, 1, 2]
    assert all(len(v) == 6 for v in results.values())


def test_bad_requests(server):
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server, "/v1/completions", {"prompt": "text prompt"})
    assert err.value.code == 400  # no tokenizer configured
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server, "/v1/completions", {"prompt": {"bad": 1}})
    assert err.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server, "/nope", {})
    assert err.value.code == 404


def test_stats_counts(server):
    with urllib.request.urlopen(server + "/stats", timeout=60) as resp:
        stats = json.load(resp)
    assert stats["submitted"] >= stats["completed"] > 0
    assert stats["tokens"] > 0


def test_per_request_sampling_params(server):
    # Greedy baseline.
    with _post(server, "/v1/completions",
               {"prompt": [11, 12, 13], "max_tokens": 6}) as resp:
        greedy = json.load(resp)["choices"][0]["token_ids"]
    # temperature=0 in the body must reproduce it.
    with _post(server, "/v1/completions",
               {"prompt": [11, 12, 13], "max_tokens": 6,
                "temperature": 0.0}) as resp:
        assert json.load(resp)["choices"][0]["token_ids"] == greedy
    # A hot stochastic request runs in the same engine (different seeds
    # per step; only sanity-check shape/validity, not token values).
    with _post(server, "/v1/completions",
               {"prompt": [11, 12, 13], "max_tokens": 6,
                "temperature": 1.2, "top_k": 8, "top_p": 0.9}) as resp:
        hot = json.load(resp)["choices"][0]["token_ids"]
    assert len(hot) == 6 and all(0 <= t < 128 for t in hot)


def test_prefix_registration_endpoint(server):
    system = [42, 43, 44, 45]
    with _post(server, "/v1/completions",
               {"prompt": system + [46], "max_tokens": 5}) as resp:
        cold = json.load(resp)["choices"][0]["token_ids"]
    with _post(server, "/v1/prefixes", {"prompt": system}) as resp:
        assert json.load(resp)["registered"] == 4
    with _post(server, "/v1/completions",
               {"prompt": system + [46], "max_tokens": 5}) as resp:
        warm = json.load(resp)["choices"][0]["token_ids"]
    assert warm == cold
    with urllib.request.urlopen(server + "/stats", timeout=60) as resp:
        assert json.load(resp)["prefix_hits"] >= 1
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server, "/v1/prefixes", {"prompt": []})
    assert err.value.code == 400


# -- chat completions --------------------------------------------------------

class _CharTok:
    """Char-level stub tokenizer (vocab 128 = tiny_test's vocab)."""

    def encode(self, text, add_special=False):
        return [min(ord(c), 127) for c in text]

    def decode(self, ids):
        return "".join(chr(i) for i in ids)


@pytest.fixture(scope="module")
def chat_server():
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM
    from rten_tpu.serve import serve

    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    engine = ServingEngine(model, params, max_batch=2, capacity=64,
                           prefill_buckets=(32,))
    srv, driver = serve(engine, tokenizer=_CharTok(), port=0, burst=1,
                        chat_template="plain")
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()
    driver.stop()
    srv.server_close()


def test_chat_completion_basic(chat_server):
    with _post(chat_server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4}) as resp:
        data = json.load(resp)
    assert data["object"] == "chat.completion"
    msg = data["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert isinstance(msg["content"], str) and len(msg["content"]) == 4
    assert data["usage"]["completion_tokens"] == 4


def test_chat_streaming_matches_non_streaming(chat_server):
    body = {"messages": [{"role": "user", "content": "abc"}],
            "max_tokens": 5}
    with _post(chat_server, "/v1/chat/completions", body) as resp:
        want = json.load(resp)["choices"][0]["message"]["content"]
    text, finish = "", None
    with _post(chat_server, "/v1/chat/completions",
               {**body, "stream": True}) as resp:
        for line in resp:
            line = line.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            evt = json.loads(line[len("data: "):])
            choice = evt["choices"][0]
            text += choice.get("delta", {}).get("content", "")
            finish = choice.get("finish_reason", finish)
    assert text == want
    assert finish == "length"


def test_chat_bad_messages(chat_server):
    for bad in ({}, {"messages": []},
                {"messages": [{"role": "alien", "content": "x"}]},
                {"messages": [{"content": "x"}]}):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(chat_server, "/v1/chat/completions", bad)
        assert exc.value.code == 400


def test_chat_templates_render():
    from rten_tpu.generate.chat import render_chat

    msgs = [{"role": "system", "content": "S"},
            {"role": "user", "content": "U"}]
    assert render_chat(msgs, "plain") == "system: S\nuser: U\nassistant: "
    assert render_chat(msgs, "zephyr") == (
        "<|system|>\nS</s>\n<|user|>\nU</s>\n<|assistant|>\n")
    assert render_chat(msgs, "chatml") == (
        "<|im_start|>system\nS<|im_end|>\n"
        "<|im_start|>user\nU<|im_end|>\n<|im_start|>assistant\n")
    assert render_chat(msgs, lambda m: "X") == "X"
    with pytest.raises(ValueError):
        render_chat(msgs, "nope")


def test_prompt_exceeding_bucket_is_rejected_not_hung(chat_server):
    """A prompt longer than the largest prefill bucket must 400 (it used
    to crash the driver thread and hang the connection)."""
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(chat_server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "x" * 64}],
            "max_tokens": 2}, timeout=60)
    assert exc.value.code == 400
    # The server is still alive and serving.
    with _post(chat_server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "ok"}],
            "max_tokens": 2}, timeout=120) as resp:
        assert json.load(resp)["choices"][0]["finish_reason"] == "length"


def test_logprobs_in_response():
    """Engine logprobs surface through the completions API."""
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM
    from rten_tpu.serve import serve

    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    engine = ServingEngine(model, model.init_params(jax.random.PRNGKey(2)),
                           max_batch=2, capacity=64, prefill_buckets=(16,),
                           logprobs=True)
    srv, driver = serve(engine, port=0, burst=1)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with _post(base, "/v1/completions",
                   {"prompt": [1, 2, 3], "max_tokens": 4,
                    "logprobs": True}) as resp:
            choice = json.load(resp)["choices"][0]
        lps = choice["logprobs"]["token_logprobs"]
        assert len(lps) == 4 and all(v <= 0.0 for v in lps)
        # Without the flag the field is absent.
        with _post(base, "/v1/completions",
                   {"prompt": [1, 2, 3], "max_tokens": 2}) as resp:
            assert "logprobs" not in json.load(resp)["choices"][0]
    finally:
        srv.shutdown()
        driver.stop()
        srv.server_close()


def test_serve_quantized_default_int8_cache():
    """The production default path: int8 weights + the engine's
    cache="auto" policy (what `--quantize` now resolves to) serves a
    completion over HTTP on the token-packed int8 cache — the
    measured-best config (BASELINE.md round 6) is what the server
    actually runs, not just what bench.py runs."""
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM,
                                             quantize_weights)
    from rten_tpu.serve import serve

    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = quantize_weights(
        model.init_params(jax.random.PRNGKey(3)), "int8")
    engine = ServingEngine(model, params, max_batch=2, capacity=64,
                           prefill_buckets=(16,), cache="auto")
    assert engine.quantized_cache  # auto resolved to int8 for Pallas cfg
    srv, driver = serve(engine, port=0, burst=1)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with _post(base, "/v1/completions",
                   {"prompt": [1, 2, 3], "max_tokens": 4}) as resp:
            choice = json.load(resp)["choices"][0]
        assert len(choice["token_ids"]) == 4
        # Parity smoke: the same engine config offline emits the same
        # tokens the HTTP path streamed out.
        eng2 = ServingEngine(model, params, max_batch=2, capacity=64,
                             prefill_buckets=(16,), cache="auto")
        assert eng2.generate([[1, 2, 3]],
                             max_new_tokens=4)[0] == choice["token_ids"]
    finally:
        srv.shutdown()
        driver.stop()
        srv.server_close()


def test_serve_demo_mesh_overlap():
    """--mesh/--overlap surface: the HTTP engine built over a (2,2)
    mesh with ring-overlap decode serves a completion (driver thread
    runs without a mesh context manager — NamedShardings carry it)."""
    import json
    import urllib.request

    import jax

    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.generate.sampler import ArgMaxSampler
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM
    from rten_tpu.parallel import make_mesh
    from rten_tpu.serve import serve

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    eng = ServingEngine(model, params, max_batch=8, capacity=64,
                        prefill_buckets=(16,), sampler=ArgMaxSampler(),
                        mesh=mesh, overlap=True)
    server, driver = serve(eng, None, "127.0.0.1", 0, burst=2, quiet=True)
    import threading
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        port = server.server_address[1]
        body = json.dumps({"prompt": [1, 2, 3], "max_tokens": 4}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=900) as resp:
            out = json.loads(resp.read())
        assert len(out["choices"][0]["token_ids"]) == 4
    finally:
        driver.stop()
        server.server_close()


def test_serve_cli_cache_wiring():
    """Round-5 review finding: main() resolved kv="auto" under
    --quantize but never passed it to ServingEngine — the CLI silently
    served an f32 KV cache. build_engine (the extracted wiring) must
    hand the policy through so --quantize runs the token-packed int8
    cache."""
    import argparse

    from rten_tpu.serve import build_engine

    args = argparse.Namespace(
        weights=None, demo=True, quantize="int8", tokenizer=None,
        fixed_greedy=False, spec_draft=0, kv_cache=None, mesh=None,
        max_batch=2, capacity=64, paged=False, page_size=64,
        logprobs=False, overlap=False)
    engine, tok = build_engine(args)
    assert tok is None
    assert engine.quantized_cache            # auto resolved to int8
    assert engine.cache.quant_scales is not None
