"""HTTP serving front-end: live server over the continuous-batching
scheduler must return the same tokens as the offline engine, serve
concurrent sync requests, and report stats/async results."""

import json
import threading
import http.client

import jax
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.inference.http_server import ServingFrontend, serve_forever
from llama32mm_tpu.inference.server import ContinuousBatchingServer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def live():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=None,
        eos_token_id=-1, steps_per_sync=3,
    )
    frontend = ServingFrontend(srv)
    httpd = serve_forever(frontend, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield cfg, params, httpd.server_address[1]
    httpd.shutdown()
    frontend.shutdown()


def _post(port, path, obj):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(obj), {"Content-Type": "application/json"})
    r = conn.getresponse()
    return r.status, json.loads(r.read())


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("GET", path)
    r = conn.getresponse()
    return r.status, json.loads(r.read())


def _ids(cfg, s, key=1):
    n_img = cfg.text_config.num_image_tokens
    ids = jax.random.randint(jax.random.PRNGKey(key), (1, s), 0, cfg.vocab_size - 10)
    return np.asarray(ids.at[:, :n_img].set(cfg.image_token_index))[0]


def test_generate_matches_offline_engine(live):
    cfg, params, port = live
    px = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (3, 28, 28)))
    ids = _ids(cfg, 11)
    eng = InferenceEngine(params, cfg, max_cache_length=64)
    want = np.asarray(
        eng.generate(ids[None], px[None], max_new_tokens=6, temperature=0.0,
                     eos_token_id=-1).tokens
    )[0]

    status, out = _post(port, "/generate", {
        "input_ids": ids.tolist(), "pixel_values": px.tolist(), "max_new_tokens": 6,
    })
    assert status == 200 and out["finished"]
    np.testing.assert_array_equal(np.asarray(out["tokens"]), want)


def test_concurrent_requests_and_stats(live):
    cfg, params, port = live
    ids = _ids(cfg, 9, key=3)
    results = {}

    def call(tag, mnt):
        results[tag] = _post(port, "/generate", {
            "input_ids": ids.tolist(), "max_new_tokens": mnt,
        })

    threads = [threading.Thread(target=call, args=(i, 4 + i)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    for tag, (status, out) in results.items():
        assert status == 200 and out["finished"], (tag, out)
        assert len(out["tokens"]) == 4 + tag

    status, st = _get(port, "/stats")
    assert status == 200 and st["finished"] >= 3


def test_async_submit_and_result(live):
    cfg, params, port = live
    ids = _ids(cfg, 10, key=5)
    status, out = _post(port, "/submit", {"input_ids": ids.tolist(), "max_new_tokens": 5})
    assert status == 200
    rid = out["request_id"]
    for _ in range(200):
        status, res = _get(port, f"/result/{rid}")
        assert status == 200
        if res["finished"]:
            break
    assert res["finished"] and len(res["tokens"]) == 5


def test_bad_request(live):
    cfg, params, port = live
    status, out = _post(port, "/generate", {"max_new_tokens": 4})
    assert status == 400 and "error" in out


def _delete(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("DELETE", path)
    r = conn.getresponse()
    return r.status, json.loads(r.read())


def test_prefix_caching_over_http(live):
    cfg, params, port = live
    prefix = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (8,), 0, cfg.vocab_size - 10)
    )
    suffix = np.asarray(
        jax.random.randint(jax.random.PRNGKey(8), (5,), 0, cfg.vocab_size - 10)
    )
    prompt = np.concatenate([prefix, suffix])
    eng = InferenceEngine(params, cfg, max_cache_length=64, prompt_buckets=None)
    want = np.asarray(
        eng.generate(prompt[None], None, max_new_tokens=5, temperature=0.0,
                     eos_token_id=-1).tokens
    )[0]

    status, out = _post(port, "/prefix", {"input_ids": prefix.tolist()})
    assert status == 200
    pid = out["prefix_id"]

    # auto-matched (no prefix_id) and pinned both hit the cache
    status, res = _post(port, "/generate", {
        "input_ids": prompt.tolist(), "max_new_tokens": 5,
    })
    assert status == 200 and res["finished"]
    np.testing.assert_array_equal(np.asarray(res["tokens"]), want)

    status, res = _post(port, "/generate", {
        "input_ids": prompt.tolist(), "max_new_tokens": 5, "prefix_id": pid,
    })
    assert status == 200
    np.testing.assert_array_equal(np.asarray(res["tokens"]), want)

    status, st = _get(port, "/stats")
    assert status == 200 and st["prefix_hits"] == 2

    status, _ = _delete(port, f"/prefix/{pid}")
    assert status == 200
    status, st = _get(port, "/stats")
    assert "prefix_hits" not in st


def test_sse_streaming_generate(live):
    cfg, params, port = live
    ids = _ids(cfg, 9, key=6)
    eng = InferenceEngine(params, cfg, max_cache_length=64, prompt_buckets=None)
    want = np.asarray(
        eng.generate(ids[None], None, max_new_tokens=7, temperature=0.0,
                     eos_token_id=-1).tokens
    )[0]

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request(
        "POST", "/generate_stream",
        json.dumps({"input_ids": ids.tolist(), "max_new_tokens": 7}),
        {"Content-Type": "application/json"},
    )
    r = conn.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "text/event-stream"

    streamed, final, events = [], None, 0
    while True:
        line = r.readline()
        if not line:
            break
        line = line.decode().strip()
        if not line.startswith("data: "):
            continue
        ev = json.loads(line[len("data: "):])
        events += 1
        if ev.get("finished"):
            final = ev
            break
        streamed.extend(ev["tokens"])

    assert final is not None and final["finished"]
    np.testing.assert_array_equal(np.asarray(final["tokens"]), want)
    np.testing.assert_array_equal(np.asarray(streamed), want)
    assert events >= 2  # tokens actually streamed before the final event


def test_text_and_image_surface(tmp_path):
    """POST /generate with {"prompt", "image": base64} runs the reference
    preprocessing pipeline server-side and must match feeding the processor's
    own outputs to the offline engine."""
    import base64
    import io

    from PIL import Image

    from llama32mm_tpu.preprocess.processor import MllamaImageProcessor
    from tests.test_preprocess import FakeTokenizer

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTokenizer()
    proc = MllamaImageProcessor(
        tok, cfg.text_config.num_image_tokens, cfg.vision_config.image_size
    )
    tok.vocab["<image>"] = cfg.image_token_index  # align with the model config

    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=(32,),
        eos_token_id=-1, steps_per_sync=2,
    )
    frontend = ServingFrontend(srv, tokenizer=None, processor=proc)
    httpd = serve_forever(frontend, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        img = Image.fromarray(
            (np.linspace(0, 255, 48 * 48 * 3).reshape(48, 48, 3)).astype(np.uint8)
        )
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()

        status, out = _post(port, "/generate", {
            "prompt": "hi", "image": b64, "max_new_tokens": 5,
        })
        assert status == 200 and out["finished"], out

        inputs = proc(["hi"], [img], padding=True)
        eng = InferenceEngine(params, cfg, max_cache_length=64, prompt_buckets=(32,))
        want = eng.generate(
            np.asarray(inputs["input_ids"], np.int32),
            np.asarray(inputs["pixel_values"], np.float32),
            max_new_tokens=5, temperature=0.0, eos_token_id=-1,
        )
        np.testing.assert_array_equal(out["tokens"], np.asarray(want.tokens)[0, :5])
        # text-only surface needs a tokenizer on the frontend
        status, out = _post(port, "/generate", {"prompt": "hi", "max_new_tokens": 3})
        assert status == 400 and "tokenizer" in out["error"]
    finally:
        httpd.shutdown()
        frontend.shutdown()
