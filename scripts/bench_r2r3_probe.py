"""Single-process decode-rate probe for the r2-vs-r3 A/B (VERDICT r3 Weak #1).

Runs ONE measurement of the engine decode rate against the package in a given
source tree, using THAT tree's own bench.py methodology (difference of two
generates, median of reps), and prints one JSON line. The driver
(``bench_r2r3_ab.py``) alternates subprocesses over the two trees so both
code versions see the same chip, same session, same protocol.

Usage: python bench_r2r3_probe.py <tree> <bf16|int8_11b> <reps>
"""

import importlib.util
import json
import sys


def main() -> None:
    tree, mode, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sys.path.insert(0, tree)

    spec = importlib.util.spec_from_file_location("bench_tree", f"{tree}/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    import jax
    import jax.numpy as jnp

    from llama32mm_tpu.configs import llama32_11b_vision_config
    from llama32mm_tpu.inference.engine import InferenceEngine
    from llama32mm_tpu.models.vlm import init_vlm_params
    from llama32mm_tpu.preprocess.image import preprocess_image_device

    if mode == "bf16":
        cfg = bench.bench_config("bfloat16")
        params = jax.jit(lambda k: init_vlm_params(k, cfg))(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        engine = InferenceEngine(params, cfg, max_cache_length=bench.CACHE_LEN)
        ids, raw, s = bench.make_inputs(cfg)
        kwargs = dict(reps=reps)
    elif mode == "int8_11b":
        cfg = llama32_11b_vision_config(max_cache_length=bench.CACHE_LEN)
        params = bench.random_int8_vlm_params(cfg)
        engine = InferenceEngine(
            params, cfg, max_cache_length=bench.CACHE_LEN, kv_dtype="int8"
        )
        ids, raw, s = bench.make_inputs(cfg, seed=5)
        # wider 112-token window than r3's bench_11b_int8 (64-16): the narrow
        # window is the suspected source of the ±20% spread
        kwargs = dict(reps=reps, max_new=128, short=16)
    else:
        raise SystemExit(f"unknown mode {mode}")

    tc = cfg.text_config
    px = jax.jit(
        lambda r: preprocess_image_device(r, cfg.vision_config.image_size, tc.jnp_dtype)
    )(raw)
    tps, spread = bench.engine_decode_rate(engine, ids, px, **kwargs)
    print(json.dumps({"tree": tree, "mode": mode, "reps": reps,
                      "tps": round(tps, 3), "spread": round(spread, 3)}))


if __name__ == "__main__":
    main()
