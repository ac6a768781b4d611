"""Compare int8 decode end-to-end: Pallas dequant-in-VMEM kernel vs XLA
fused-dequant, via two InferenceEngine variants on the bench config.

Run: python -u scripts/bench_int8_decode.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import CACHE_LEN, MAX_NEW, PROMPT_TEXT_LEN, bench_config
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.ops.quant import quantize_llama_params


def measure(engine, ids, px):
    def run(max_new):
        return np.asarray(
            engine.generate(
                ids, px, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1,
                rng=jax.random.PRNGKey(0),
            ).tokens
        )

    run(1)
    run(MAX_NEW)
    t1 = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(1)
        t1.append(time.perf_counter() - t0)
    tN = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(MAX_NEW)
        tN.append(time.perf_counter() - t0)
    ttft = float(np.percentile(t1, 50))
    tot = float(np.percentile(tN, 50))
    return (MAX_NEW - 1) / (tot - ttft), ttft


def main():
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    params = jax.device_put(init_vlm_params(jax.random.PRNGKey(0), cfg))
    qparams = quantize_llama_params(params, free_originals=True)
    params = None

    n_img = tc.num_image_tokens
    s = n_img + PROMPT_TEXT_LEN
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, s), 0, tc.vocab_size - 10)
    ids = ids.at[:, :n_img].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 560, 560), tc.jnp_dtype)

    # Flip ONLY qlinear's backend between runs (engine impl stays "auto" so
    # every other op routes identically). qlinear dispatches via
    # resolve_impl_prefer_xla — patch THAT symbol (patching resolve_impl was
    # the original, now-dead dispatch and would silently measure XLA twice).
    import llama32mm_tpu.ops.quant as quant_mod

    orig_resolve = quant_mod.resolve_impl_prefer_xla
    for qimpl in ("pallas", "xla"):
        quant_mod.resolve_impl_prefer_xla = lambda impl="auto", _v=qimpl: _v
        eng = InferenceEngine(qparams, cfg, max_cache_length=CACHE_LEN)
        tps, ttft = measure(eng, ids, px)
        print(f"int8 decode qlinear={qimpl:7s} {tps:7.1f} tok/s  (ttft {ttft * 1e3:.0f} ms)", flush=True)
        del eng
    quant_mod.resolve_impl_prefer_xla = orig_resolve


if __name__ == "__main__":
    main()
