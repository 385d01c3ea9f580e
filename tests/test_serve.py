"""HTTP serving layer: OpenAI-style completions over the engine.

Drives a real ThreadingHTTPServer on an ephemeral port with the engine in
CPU interpret mode; greedy decode is deterministic, so HTTP responses are
checked token-exact against an identical offline engine."""

import http.client
import json

import jax
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer
from tpu_flash.serve import ByteTokenizer, EngineServer, serve


def _engine():
    model = FlashTransformer(TINY_TEST)
    params = model.init(jax.random.PRNGKey(0))
    cfg = EngineConfig(
        max_batch_size=4,
        max_seq_len=256,
        prefill_chunk=64,
        cache=CacheConfig(page_size=32, num_pages=64, max_pages_per_seq=8),
    )
    return InferenceEngine(model, params, cfg, interpret=True)


@pytest.fixture(scope="module")
def served():
    httpd, es = serve(
        _engine(), port=0, tokenizer=ByteTokenizer(offset=0),
        model_name="tiny-test", block=False,
    )
    yield httpd.server_address
    httpd.shutdown()
    es.close()


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=300)
    conn.request(
        method, path,
        body=json.dumps(body) if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_models_and_health(served):
    status, data = _request(served, "GET", "/v1/models")
    assert status == 200
    assert json.loads(data)["data"][0]["id"] == "tiny-test"
    status, data = _request(served, "GET", "/health")
    assert status == 200
    assert json.loads(data)["status"] == "ok"


def test_greedy_completion_matches_offline(served):
    prompt = [1, 2, 3, 4, 5]
    status, data = _request(
        served, "POST", "/v1/completions",
        {"prompt": prompt, "max_tokens": 8},
    )
    assert status == 200
    resp = json.loads(data)
    assert resp["object"] == "text_completion"
    (choice,) = resp["choices"]
    offline = _engine()
    rid = offline.submit(prompt, max_new_tokens=8)
    expected = offline.run()[rid]
    assert choice["tokens"] == expected
    assert choice["finish_reason"] == "length"
    assert len(choice["token_logprobs"]) == 8
    assert resp["usage"] == {
        "prompt_tokens": 5, "completion_tokens": 8, "total_tokens": 13,
    }


def test_streaming_matches_non_streaming(served):
    prompt = [9, 8, 7, 6]
    status, data = _request(
        served, "POST", "/v1/completions",
        {"prompt": prompt, "max_tokens": 6, "stream": True},
    )
    assert status == 200
    events = [
        json.loads(line[len(b"data: "):])
        for line in data.split(b"\n\n")
        if line.startswith(b"data: ") and b"[DONE]" not in line
    ]
    assert data.rstrip().endswith(b"data: [DONE]")
    streamed = [
        t for e in events if e["object"] == "text_completion.chunk"
        for t in e["choices"][0]["tokens"]
    ]
    final = [e for e in events if e["object"] == "text_completion"]
    assert len(final) == 1
    assert streamed == final[0]["choices"][0]["tokens"]
    status2, data2 = _request(
        served, "POST", "/v1/completions",
        {"prompt": prompt, "max_tokens": 6},
    )
    assert streamed == json.loads(data2)["choices"][0]["tokens"]


def test_parallel_sampling_n2(served):
    status, data = _request(
        served, "POST", "/v1/completions",
        {"prompt": [5, 5, 5], "max_tokens": 4, "n": 2,
         "temperature": 0.9, "top_p": 0.9},
    )
    assert status == 200
    choices = json.loads(data)["choices"]
    assert [c["index"] for c in choices] == [0, 1]
    assert all(len(c["tokens"]) == 4 for c in choices)


def test_text_prompt_and_decode(served):
    status, data = _request(
        served, "POST", "/v1/completions",
        {"prompt": "hi", "max_tokens": 3},
    )
    assert status == 200
    (choice,) = json.loads(data)["choices"]
    assert ByteTokenizer(offset=0).decode(choice["tokens"]) == choice["text"]


def test_logit_bias_forces_stop(served):
    # +100 bias forces token 5 every step; stop=[5] ends generation at 1.
    status, data = _request(
        served, "POST", "/v1/completions",
        {"prompt": [1, 2, 3], "max_tokens": 8, "stop": [5],
         "logit_bias": {"5": 100.0}},
    )
    assert status == 200
    (choice,) = json.loads(data)["choices"]
    assert choice["tokens"] == [5]
    assert choice["finish_reason"] == "stop"


def test_bad_requests(served):
    status, _ = _request(
        served, "POST", "/v1/completions", {"prompt": "x" * 10**6}
    )
    assert status == 400  # page pool can never fit it
    status, _ = _request(
        served, "POST", "/v1/completions", {"prompt": {"not": "valid"}}
    )
    assert status == 400
    status, _ = _request(served, "POST", "/v1/unknown", {})
    assert status == 404


def test_engine_server_direct_api():
    # EngineServer without HTTP: queue protocol end to end.
    es = EngineServer(_engine())
    q = es.submit({"prompt": [4, 4, 4, 4], "max_tokens": 5}, stream=False)
    kind, rid = q.get(timeout=300)
    assert kind == "accepted"
    kind, payload = q.get(timeout=300)
    assert kind == "done"
    assert len(payload["choices"][0]["tokens"]) == 5
    es.close()


def test_engine_cancel():
    # cancel() of an active request frees its pages and stops decoding;
    # a waiting request is dropped before admission.
    eng = _engine()
    r1 = eng.submit([1, 2, 3], max_new_tokens=64)
    for _ in range(3):
        eng.step()
    assert r1 in eng.scheduler.active
    emitted = len(eng.outputs[r1])
    assert eng.cancel(r1)
    eng.step()
    assert r1 not in eng.scheduler.active
    assert not eng.scheduler.has_work()
    assert len(eng.outputs[r1]) <= emitted + eng.config.max_decode_burst
    # pool fully recovered: a new request admits and completes
    r2 = eng.submit([4, 5, 6], max_new_tokens=4)
    out = eng.run()
    assert len(out[r2]) == 4
    # waiting-queue cancellation
    r3 = eng.submit([7, 8], max_new_tokens=4)
    assert eng.cancel(r3)
    assert not eng.scheduler.has_work()
    assert not eng.cancel(r3)  # nothing live anymore


def test_server_cancel_request():
    es = EngineServer(_engine())
    q = es.submit({"prompt": [3, 3, 3], "max_tokens": 200}, stream=True)
    kind, rid = q.get(timeout=300)
    assert kind == "accepted"
    # wait for first tokens, then cancel mid-generation
    while True:
        ev = q.get(timeout=300)
        if ev[0] == "tokens":
            break
    es.cancel_request(rid)
    # worker acknowledges with a non-internal error event
    while True:
        ev = q.get(timeout=300)
        if ev[0] == "error":
            assert ev[1] == "cancelled"
            break
        assert ev[0] == "tokens"
    # engine is idle afterwards (pages released, nothing decoding)
    import time as _t

    for _ in range(100):
        if not es.engine.scheduler.has_work():
            break
        _t.sleep(0.05)
    assert not es.engine.scheduler.has_work()
    es.close()
