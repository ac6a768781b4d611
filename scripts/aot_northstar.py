"""AOT-compile the north-star configs against real TPU topologies (VERDICT r2 #2).

Uses ``jax.experimental.topologies`` to build a **compile-only** device mesh
for the target slices — v5e:2x4 (v5e-8) and v5p:4x4 (v5p-16) — and lowers the
REAL-shape programs through the actual TPU compiler (libtpu), with parameters
as ``jax.eval_shape`` abstractions (no arrays ever materialize). The
compiler's ``memory_analysis()`` reports per-chip argument/temp/peak HBM —
the evidence hand arithmetic (round-2 ``plan90b``) could not provide: it
includes collective buffers, fusion temps, and layout padding.

Cases (BASELINE.json north star + config #5):
  1. 11B-Vision bf16 SERVING on v5e-8 (tp=8): full engine generate program —
     ViT-H/14@560 encode + image-prompt prefill + 128-step while_loop decode.
  2. 90B-Vision bf16 SERVING on v5p-16 (dp=2, tp=8).
  3. 90B-Vision LoRA TRAIN step on v5p-16 (dp=2, tp=8, remat + chunked CE,
     T=4096).

Run: python -u scripts/aot_northstar.py [--case all|11b_serve|90b_serve|90b_train]
Prints one JSON line per case; paste results into docs/AOT_NORTHSTAR.md.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llama32mm_tpu.configs import (
    llama32_11b_vision_config,
    llama32_90b_vision_config,
)
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.parallel.sharding import param_shardings

GB = 1024**3


def build_mesh(topo_name: str, shape: tuple, axes: tuple) -> Mesh:
    topo = topologies.get_topology_desc(topo_name)
    return Mesh(np.array(topo.devices).reshape(shape), axes)


def abstract_params(cfg, mesh, vision_tp=False):
    pshapes = jax.eval_shape(lambda k: init_vlm_params(k, cfg), jax.random.PRNGKey(0))
    stree = param_shardings(cfg, mesh, params_like=pshapes, vision_tp=vision_tp)

    def attach(ss, sh):
        return None if ss is None else jax.ShapeDtypeStruct(ss.shape, ss.dtype, sharding=sh)

    return jax.tree.map(attach, pshapes, stree, is_leaf=lambda x: x is None)


def collective_summary(hlo_text: str) -> dict:
    ops = {}
    for kind in ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
                 "all-to-all"):
        n = len(re.findall(rf"\b{kind}(?:-start)?\(", hlo_text)) or len(
            re.findall(rf"= \S+ {kind}", hlo_text)
        )
        if n:
            ops[kind] = n
    return ops


def report(name, mesh, compiled, t_compile, extra=None):
    ma = compiled.memory_analysis()
    n = mesh.devices.size
    rec = {
        "case": name,
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "devices": n,
        "compile_s": round(t_compile, 1),
        "per_chip": {
            "arguments_gb": round(ma.argument_size_in_bytes / GB, 3),
            "outputs_gb": round(ma.output_size_in_bytes / GB, 3),
            "temps_gb": round(ma.temp_size_in_bytes / GB, 3),
            "peak_gb": round(ma.peak_memory_in_bytes / GB, 3),
            "aliased_gb": round(ma.alias_size_in_bytes / GB, 3),
        },
        "collectives": collective_summary(compiled.as_text()),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def serve_case(name, cfg, mesh, batch, prompt_len, max_new, cache_len,
               vision_tp=False):
    from llama32mm_tpu.inference.engine import InferenceEngine

    tc = cfg.text_config
    params = abstract_params(cfg, mesh, vision_tp=vision_tp)
    eng = InferenceEngine(params, cfg, max_cache_length=cache_len, gemv_routes=None)
    gen = eng._make_generate(max_new, 0.0, 0.9, 50, 0.0, 1.0, -1, True)

    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp")) if mesh.shape.get("dp", 1) > 1 else repl
    dp4 = (
        NamedSharding(mesh, P("dp", None, None, None))
        if mesh.shape.get("dp", 1) > 1
        else repl
    )
    ids = jax.ShapeDtypeStruct((batch, prompt_len), jnp.int32, sharding=dp)
    px = jax.ShapeDtypeStruct(
        (batch, 3, cfg.vision_config.image_size, cfg.vision_config.image_size),
        tc.jnp_dtype, sharding=dp4,
    )
    pad = jax.ShapeDtypeStruct((batch, prompt_len), jnp.int32, sharding=dp)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl)

    t0 = time.perf_counter()
    lowered = gen.lower(params, ids, px, pad, rng)
    compiled = lowered.compile()
    return report(
        name, mesh, compiled, time.perf_counter() - t0,
        extra={"batch": batch, "prompt_len": prompt_len, "max_new": max_new,
               "cache_len": cache_len, "dtype": tc.dtype},
    )


def train_case(name, cfg, mesh, batch, seq_len, rank=16, loss_chunk=1024):
    from llama32mm_tpu.train.lora import init_lora_params, make_lora_train_step
    from llama32mm_tpu.parallel.sharding import lora_shardings

    tc = cfg.text_config
    params = abstract_params(cfg, mesh)
    lora_shapes = jax.eval_shape(
        lambda k: init_lora_params(k, tc, rank=rank), jax.random.PRNGKey(1)
    )
    ltree = lora_shardings(mesh, lora_shapes)
    lora = jax.tree.map(
        lambda ss, sh: jax.ShapeDtypeStruct(ss.shape, ss.dtype, sharding=sh),
        lora_shapes, ltree,
    )

    init_state, step = make_lora_train_step(
        cfg, learning_rate=1e-4, remat=True, loss_chunk=loss_chunk
    )
    state_shapes = jax.eval_shape(init_state, lora_shapes)
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda ss: jax.ShapeDtypeStruct(ss.shape, ss.dtype, sharding=repl),
        state_shapes,
    )

    dp = NamedSharding(mesh, P("dp")) if mesh.shape.get("dp", 1) > 1 else repl
    dp2 = (
        NamedSharding(mesh, P("dp", None)) if mesh.shape.get("dp", 1) > 1 else repl
    )
    dp4 = (
        NamedSharding(mesh, P("dp", None, None, None))
        if mesh.shape.get("dp", 1) > 1
        else repl
    )
    batch_abs = {
        "input_ids": jax.ShapeDtypeStruct((batch, seq_len), jnp.int32, sharding=dp2),
        "pixel_values": jax.ShapeDtypeStruct(
            (batch, 3, cfg.vision_config.image_size, cfg.vision_config.image_size),
            tc.jnp_dtype, sharding=dp4,
        ),
        "labels": jax.ShapeDtypeStruct((batch, seq_len), jnp.int32, sharding=dp2),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl)

    t0 = time.perf_counter()
    lowered = jax.jit(step).lower(params, state, batch_abs, rng)
    compiled = lowered.compile()
    return report(
        name, mesh, compiled, time.perf_counter() - t0,
        extra={"batch": batch, "seq_len": seq_len, "lora_rank": rank,
               "loss_chunk": loss_chunk, "remat": True, "dtype": tc.dtype},
    )


def full_train_case(name, cfg, mesh, batch, seq_len, loss_chunk=1024,
                    zero1=True, zero1_masters=True, donate=True):
    """90B FULL fine-tune step: fp32 masters + AdamW moments. TP-only this is
    12 B/param = 135 GB/chip at tp=8 (docs/AOT_NORTHSTAR.md) — does not fit a
    v5p. ZeRO partitioning (train/full.py zero1_params/zero1_masters) shards
    the optimizer state (and optionally the masters) over dp as well; this
    case lets the compiler's memory_analysis decide whether it fits."""
    from llama32mm_tpu.train.full import (
        FullTrainState, make_optimizer, make_train_step, split_trainable,
    )
    from llama32mm_tpu.parallel.sharding import zero1_shardings
    import optax

    tc = cfg.text_config
    repl = NamedSharding(mesh, P())
    params = abstract_params(cfg, mesh)
    trainable, frozen = split_trainable(params, freeze_vision=True)

    def to_master(sds):  # fp32 masters, same GSPMD layout as the bf16 weights
        dt = jnp.float32 if jnp.issubdtype(sds.dtype, jnp.floating) else sds.dtype
        return jax.ShapeDtypeStruct(sds.shape, dt, sharding=sds.sharding)

    masters = jax.tree.map(to_master, trainable)
    z1 = zero1_shardings(masters, axis="dp") if zero1 else jax.tree.map(
        lambda p: p.sharding, masters
    )
    if zero1 and zero1_masters:
        masters = jax.tree.map(
            lambda sds, s: jax.ShapeDtypeStruct(sds.shape, sds.dtype, sharding=s),
            masters, z1,
        )

    tx = make_optimizer(learning_rate=1e-5)
    opt_shapes = jax.eval_shape(tx.init, masters)
    opt_state = optax.tree_map_params(
        tx,
        lambda sds, s: jax.ShapeDtypeStruct(sds.shape, sds.dtype, sharding=s),
        opt_shapes, z1,
    )
    opt_state = jax.tree.map(  # non-param leaves (adam counts): replicate
        lambda sds: sds if sds.sharding is not None
        else jax.ShapeDtypeStruct(sds.shape, sds.dtype, sharding=repl),
        opt_state,
    )
    state = FullTrainState(
        params=masters,
        frozen=frozen,
        opt_state=opt_state,
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=repl),
    )

    zp = {**frozen, **masters} if zero1 else None
    init_unused, step = make_train_step(
        cfg, learning_rate=1e-5, freeze_vision=True, compute_dtype="bfloat16",
        remat=True, loss_chunk=loss_chunk,
        zero1_params=zp, zero1_masters=zero1_masters,
    )

    dp = NamedSharding(mesh, P("dp")) if mesh.shape.get("dp", 1) > 1 else repl
    dp2 = NamedSharding(mesh, P("dp", None)) if mesh.shape.get("dp", 1) > 1 else repl
    dp4 = (
        NamedSharding(mesh, P("dp", None, None, None))
        if mesh.shape.get("dp", 1) > 1 else repl
    )
    batch_abs = {
        "input_ids": jax.ShapeDtypeStruct((batch, seq_len), jnp.int32, sharding=dp2),
        "pixel_values": jax.ShapeDtypeStruct(
            (batch, 3, cfg.vision_config.image_size, cfg.vision_config.image_size),
            tc.jnp_dtype, sharding=dp4,
        ),
        "labels": jax.ShapeDtypeStruct((batch, seq_len), jnp.int32, sharding=dp2),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl)

    t0 = time.perf_counter()
    jitted = jax.jit(step, donate_argnums=(0,)) if donate else jax.jit(step)
    compiled = jitted.lower(state, batch_abs, rng).compile()
    return report(
        name, mesh, compiled, time.perf_counter() - t0,
        extra={"batch": batch, "seq_len": seq_len, "loss_chunk": loss_chunk,
               "remat": True, "zero1": zero1, "zero1_masters": zero1_masters,
               "donated": donate, "masters_dtype": "float32",
               "compute_dtype": "bfloat16"},
    )


def pp_train_case(name, cfg, mesh, batch, seq_len, n_microbatches,
                  loss_chunk=1024, tp=False):
    """90B text-decoder FULL-param Adam step through the pp pipeline
    (parallel/pipeline.py): blocks + their Adam moments live stage-local
    (1/pp per chip); embedding/lm_head replicated. The compiler's
    memory_analysis decides whether the GPipe layout fits."""
    import optax

    from llama32mm_tpu.models.language import init_causal_lm_params
    from llama32mm_tpu.parallel.pipeline import (
        make_pipeline_train_step, pipeline_param_specs,
    )

    tc = cfg.text_config
    repl = NamedSharding(mesh, P())
    pshapes = jax.eval_shape(
        lambda k: init_causal_lm_params(k, tc), jax.random.PRNGKey(0)
    )
    spec_tree = {"model": pipeline_param_specs(pshapes["model"], tp=tp),
                 "lm_head": jax.tree.map(lambda _: P(), pshapes["lm_head"])}

    def attach(ss, spec):
        return None if ss is None else jax.ShapeDtypeStruct(
            ss.shape, ss.dtype, sharding=NamedSharding(mesh, spec)
        )

    params = jax.tree.map(attach, pshapes, spec_tree, is_leaf=lambda x: x is None)
    tx = optax.adam(1e-4)
    opt_shapes = jax.eval_shape(tx.init, pshapes)
    opt = optax.tree_map_params(
        tx,
        lambda ss, p: None if ss is None else jax.ShapeDtypeStruct(
            ss.shape, ss.dtype, sharding=p.sharding
        ),
        opt_shapes, params,
    )
    opt = jax.tree.map(
        lambda ss: ss if isinstance(ss, jax.ShapeDtypeStruct) and ss.sharding is not None
        else (None if ss is None else jax.ShapeDtypeStruct(ss.shape, ss.dtype, sharding=repl)),
        opt, is_leaf=lambda x: x is None or isinstance(x, jax.ShapeDtypeStruct),
    )
    state = {"params": params, "opt": opt,
             "step": jax.ShapeDtypeStruct((), jnp.int32, sharding=repl)}

    dp = NamedSharding(mesh, P("dp")) if mesh.shape.get("dp", 1) > 1 else repl
    batch_abs = {
        "input_ids": jax.ShapeDtypeStruct((batch, seq_len), jnp.int32, sharding=dp),
        "labels": jax.ShapeDtypeStruct((batch, seq_len), jnp.int32, sharding=dp),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl)

    init_unused, step = make_pipeline_train_step(
        tc, mesh, n_microbatches=n_microbatches, learning_rate=1e-4,
        remat=True, loss_chunk=loss_chunk,
    )
    t0 = time.perf_counter()
    compiled = jax.jit(step, donate_argnums=(0,)).lower(state, batch_abs, rng).compile()
    return report(
        name, mesh, compiled, time.perf_counter() - t0,
        extra={"batch": batch, "seq_len": seq_len, "microbatches": n_microbatches,
               "loss_chunk": loss_chunk, "remat": True, "dtype": tc.dtype,
               "pp": mesh.shape.get("pp", 1), "tp": mesh.shape.get("tp", 1),
               "full_param_adam": True},
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="all",
                    choices=["all", "11b_serve", "90b_serve", "90b_train",
                             "90b_full_train", "11b_serve_vtp", "90b_pp_train",
                             "90b_pp_tp_train"])
    args = ap.parse_args()

    if args.case in ("all", "11b_serve"):
        # v5e-8: pure TP over the 8 chips (heads 32/8, kv 8/8, vocab 128256/8)
        cfg = llama32_11b_vision_config("bfloat16", max_cache_length=2048)
        mesh = build_mesh("v5e:2x4", (1, 1, 8), ("dp", "sp", "tp"))
        serve_case("11b_bf16_serve_v5e8", cfg, mesh, batch=1,
                   prompt_len=1632, max_new=128, cache_len=2048)

    if args.case in ("all", "11b_serve_vtp"):
        # same layout with the ViT tower TP-sharded (vision_tp=True): the
        # TTFT lever — vision FLOPs/chip drop ~8×
        cfg = llama32_11b_vision_config("bfloat16", max_cache_length=2048)
        mesh = build_mesh("v5e:2x4", (1, 1, 8), ("dp", "sp", "tp"))
        serve_case("11b_bf16_serve_v5e8_vision_tp", cfg, mesh, batch=1,
                   prompt_len=1632, max_new=128, cache_len=2048, vision_tp=True)

    if args.case in ("all", "90b_serve"):
        # v5p-16: tp=8 (kv heads divide), dp=2 serving replicas
        cfg = llama32_90b_vision_config("bfloat16", max_cache_length=2048)
        mesh = build_mesh("v5p:4x4", (2, 1, 8), ("dp", "sp", "tp"))
        serve_case("90b_bf16_serve_v5p16", cfg, mesh, batch=2,
                   prompt_len=1632, max_new=128, cache_len=2048)

    if args.case in ("all", "90b_train"):
        cfg = llama32_90b_vision_config("bfloat16", max_cache_length=4096)
        mesh = build_mesh("v5p:4x4", (2, 1, 8), ("dp", "sp", "tp"))
        train_case("90b_lora_train_v5p16", cfg, mesh, batch=2, seq_len=4096)

    if args.case in ("all", "90b_full_train"):
        cfg = llama32_90b_vision_config("bfloat16", max_cache_length=4096)
        mesh = build_mesh("v5p:4x4", (2, 1, 8), ("dp", "sp", "tp"))
        full_train_case("90b_full_train_v5p16_zero1", cfg, mesh,
                        batch=2, seq_len=4096, zero1=True, zero1_masters=True)

    if args.case in ("all", "90b_pp_train"):
        # pipeline layout: 16 stages × 5 layers, text decoder full-param Adam
        cfg = llama32_90b_vision_config("bfloat16", max_cache_length=4096)
        mesh = build_mesh("v5p:4x4", (1, 16), ("dp", "pp"))
        pp_train_case("90b_pp_train_v5p16", cfg, mesh, batch=8, seq_len=4096,
                      n_microbatches=8)

    if args.case in ("all", "90b_pp_tp_train"):
        # 3D-capable pp×tp layout: 2 stages × 40 layers, each stage tp=8
        cfg = llama32_90b_vision_config("bfloat16", max_cache_length=4096)
        mesh = build_mesh("v5p:4x4", (1, 2, 8), ("dp", "pp", "tp"))
        pp_train_case("90b_pp_tp_train_v5p16", cfg, mesh, batch=8,
                      seq_len=4096, n_microbatches=8, tp=True)


if __name__ == "__main__":
    main()
