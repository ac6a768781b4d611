"""Serving robustness: bounded admission queue (429 backpressure),
per-request deadlines, SSE client-disconnect cancellation, graceful drain.

The reference serves one request per process (Inference/Inference.py) and has
none of these concerns; a long-running server needs all of them (VERDICT r2
'Next' #6)."""

import http.client
import json
import threading
import time

import jax
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.inference.http_server import ServingFrontend, serve_forever
from llama32mm_tpu.inference.server import ContinuousBatchingServer, QueueFullError

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _ids(cfg, s, key=1):
    ids = jax.random.randint(jax.random.PRNGKey(key), (1, s), 0, cfg.vocab_size - 10)
    return np.asarray(ids)[0]


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


def test_queue_bound_raises(tiny):
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=32, prompt_buckets=None,
        eos_token_id=-1, max_queue=2,
    )
    ids = _ids(cfg, 5)
    srv.submit(ids, None, 4)
    srv.submit(ids, None, 4)
    with pytest.raises(QueueFullError):
        srv.submit(ids, None, 4)
    # draining the queue frees capacity again
    srv.run()
    rid = srv.submit(ids, None, 4)
    srv.run()
    assert srv.is_finished(rid)
    assert srv.stats()["max_queue"] == 2


def test_deadline_expires_queued_request(tiny):
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=32, prompt_buckets=None,
        eos_token_id=-1,
    )
    ids = _ids(cfg, 5)
    rid = srv.submit(ids, None, 4, timeout_s=0.01)
    time.sleep(0.03)
    srv.step()  # expiry runs before admission
    req = srv._results[rid]
    assert req.finished and req.timed_out
    assert srv.stats()["timeouts"] == 1


def test_deadline_expires_running_request_keeps_partial_tokens(tiny):
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=None,
        eos_token_id=-1, steps_per_sync=1,
    )
    ids = _ids(cfg, 5, key=2)
    rid = srv.submit(ids, None, 50, timeout_s=0.3)
    srv.step()  # admit (+ first decode chunk)
    assert len(srv.tokens_so_far(rid)) > 0 and not srv.is_finished(rid)
    time.sleep(0.35)  # let the deadline pass mid-decode
    srv.step()
    req = srv._results[rid]
    assert req.finished and req.timed_out
    assert 0 < len(req.tokens) < 50
    # the slot is reclaimed for the next request
    rid2 = srv.submit(ids, None, 3)
    srv.run()
    assert srv.is_finished(rid2) and len(srv.tokens_so_far(rid2)) == 3


def test_invalid_timeout_and_queue_args(tiny):
    cfg, params = tiny
    with pytest.raises(ValueError):
        ContinuousBatchingServer(params, cfg, slots=1, max_cache_length=32,
                                 max_queue=0)
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=32, prompt_buckets=None,
    )
    with pytest.raises(ValueError):
        srv.submit(_ids(cfg, 5), None, 4, timeout_s=-1.0)


@pytest.fixture()
def live(tiny):
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=512, prompt_buckets=None,
        eos_token_id=-1, steps_per_sync=1, max_queue=4,
    )
    frontend = ServingFrontend(srv)
    httpd = serve_forever(frontend, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield cfg, frontend, httpd.server_address[1]
    httpd.shutdown()
    frontend.shutdown()


def test_http_429_while_draining(live):
    cfg, frontend, port = live
    frontend._draining = True
    try:
        status, out = _post(port, "/generate", {
            "input_ids": _ids(cfg, 5).tolist(), "max_new_tokens": 2,
        })
        assert status == 429 and "error" in out
    finally:
        frontend._draining = False


def test_http_timeout_s_flag(live):
    cfg, frontend, port = live
    status, out = _post(port, "/generate", {
        "input_ids": _ids(cfg, 5).tolist(), "max_new_tokens": 500,
        "timeout_s": 0.5,
    })
    assert status == 200 and out["finished"]
    assert out.get("timed_out") is True
    assert 0 < len(out["tokens"]) < 500


def test_sse_client_disconnect_cancels_request(live):
    cfg, frontend, port = live
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request(
        "POST", "/generate_stream",
        json.dumps({"input_ids": _ids(cfg, 5, key=4).tolist(),
                    "max_new_tokens": 500}),
        {"Content-Type": "application/json"},
    )
    r = conn.getresponse()
    assert r.status == 200
    # read one streamed event, then vanish
    line = r.readline()
    assert line
    conn.close()
    # the handler's next write hits the broken pipe and cancels the request,
    # freeing the slot
    deadline = time.monotonic() + 30.0
    while time.monotonic() < deadline:
        status, st = _get(port, "/stats")
        if st["slots_busy"] == 0 and st["queued"] == 0:
            return
        time.sleep(0.05)
    pytest.fail(f"slot not reclaimed after SSE disconnect: {st}")


def test_graceful_drain(tiny):
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=None,
        eos_token_id=-1, steps_per_sync=1,
    )
    frontend = ServingFrontend(srv)
    try:
        rid = frontend.submit(_ids(cfg, 5, key=6), None, 8)
        assert frontend.drain(timeout=60.0)
        toks, fin = frontend.tokens_so_far(rid)
        assert fin and len(toks) == 8
        with pytest.raises(QueueFullError):
            frontend.submit(_ids(cfg, 5, key=6), None, 2)
    finally:
        frontend.shutdown()
