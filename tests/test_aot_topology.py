"""Compile-only topology AOT (scripts/aot_northstar.py mechanics).

Pins the round-3 north-star evidence path: build a v5e-8 mesh from
``jax.experimental.topologies`` (no devices), attach GSPMD shardings to
``jax.eval_shape`` parameter abstractions, lower the serving generate through
the real TPU compiler, and read ``memory_analysis()``. Runs wherever libtpu
is importable (CPU test boxes included — the compiler needs no chip);
skips cleanly elsewhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _topo_mesh():
    from jax.experimental import topologies
    from jax.sharding import Mesh

    try:
        topo = topologies.get_topology_desc("v5e:2x4")
    except Exception as e:  # no libtpu / unsupported plugin
        pytest.skip(f"TPU compile-only topology unavailable: {e}")
    return Mesh(np.array(topo.devices).reshape(1, 1, 8), ("dp", "sp", "tp"))


def test_topology_aot_serving_generate():
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as g
    from llama32mm_tpu.inference.engine import InferenceEngine
    from llama32mm_tpu.models.vlm import init_vlm_params
    from llama32mm_tpu.parallel.sharding import param_shardings

    mesh = _topo_mesh()
    cfg = g._modest_config("bfloat16")
    pshapes = jax.eval_shape(lambda k: init_vlm_params(k, cfg), jax.random.PRNGKey(0))
    stree = param_shardings(cfg, mesh, params_like=pshapes)
    params = jax.tree.map(
        lambda ss, sh: None if ss is None else jax.ShapeDtypeStruct(ss.shape, ss.dtype, sharding=sh),
        pshapes, stree, is_leaf=lambda x: x is None,
    )

    eng = InferenceEngine(params, cfg, max_cache_length=256, gemv_routes=None)
    gen = eng._make_generate(8, 0.0, 0.9, 50, 0.0, 1.0, -1, True)
    repl = NamedSharding(mesh, P())
    b, s = 1, 96
    img = cfg.vision_config.image_size
    lowered = gen.lower(
        params,
        jax.ShapeDtypeStruct((b, s), jnp.int32, sharding=repl),
        jax.ShapeDtypeStruct((b, 3, img, img), jnp.bfloat16, sharding=repl),
        jax.ShapeDtypeStruct((b, s), jnp.int32, sharding=repl),
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl),
    )
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    # the modest config is ~20 MB of params; sharded + replicated-vision must
    # land well under 1 GB/chip and be nonzero
    assert 0 < ma.peak_memory_in_bytes < 1 << 30
    # TP layout must have inserted cross-chip collectives
    assert "all-reduce" in compiled.as_text()
