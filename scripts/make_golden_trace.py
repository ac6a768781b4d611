"""Regenerate the vendored golden-logits trace ``tests/golden/tiny_vlm_trace.npz``
from the reference torch oracle (VERDICT r3 Weak #5 — committed script instead
of git archaeology).

Requires the reference mount (default ``/root/reference``, override with
``LLAMA32MM_REFERENCE``). The trace holds the tiny fp32 oracle's weights
converted to this framework's layout (flattened in ``jax.tree.flatten`` order
of the ``init_vlm_params`` eval_shape struct — the order ``test_golden.py``
reads them back in), the inputs, and the oracle's logits + shifted-CE loss.

Run: ``PYTHONPATH=/root/repo python scripts/make_golden_trace.py``
Inputs mirror ``tests/test_parity_reference.py::_rand_inputs`` (torch
generator seed 1, model seed 0) so the regenerated trace is reproducible.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from reference_oracle import (  # noqa: E402
    build_reference_tiny,
    import_reference,
    reference_available,
    torch_vlm_to_params,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                      "tiny_vlm_trace.npz")


def main() -> None:
    if not reference_available():
        raise SystemExit("reference repo not mounted; cannot regenerate trace")
    import torch

    ref_model = import_reference()
    torch.manual_seed(0)
    ref_cfg, model = build_reference_tiny(ref_model, torch)

    from llama32mm_tpu import tiny_mllama_config
    from llama32mm_tpu.models.vlm import init_vlm_params

    cfg = tiny_mllama_config()
    params = torch_vlm_to_params(
        model, cfg.text_config.n_layers, cfg.vision_config.num_hidden_layers
    )

    # inputs: same recipe/seed as test_parity_reference._rand_inputs
    B, S = 2, 12
    g = torch.Generator().manual_seed(1)
    ids = torch.randint(0, cfg.vocab_size - 10, (B, S), generator=g)
    ids[:, :4] = cfg.image_token_index
    px = torch.randn(B, 3, 28, 28, generator=g)
    mask = torch.ones(B, S, dtype=torch.long)
    labels = ids.clone()
    labels[:, :4] = -100

    with torch.no_grad():
        out = model(input_ids=ids, pixel_values=px, attention_mask=mask,
                    labels=labels)

    struct = jax.eval_shape(
        lambda k: init_vlm_params(k, cfg, tie_weights=False), jax.random.PRNGKey(0)
    )
    want_flat, _ = jax.tree.flatten(struct)
    got_flat, _ = jax.tree.flatten(params)
    assert len(want_flat) == len(got_flat)
    arrays = {}
    for i, (want, got) in enumerate(zip(want_flat, got_flat)):
        a = np.asarray(got, dtype=np.float32)
        assert tuple(want.shape) == a.shape, (i, want.shape, a.shape)
        arrays[f"param_{i}"] = a

    arrays.update(
        input_ids=ids.numpy(),
        pixel_values=px.numpy().astype(np.float32),
        attention_mask=mask.numpy(),
        labels=labels.numpy(),
        logits=out["logits"].numpy().astype(np.float32),
        loss=np.asarray(float(out["loss"]), np.float32),
    )
    np.savez(GOLDEN, **arrays)
    print(f"wrote {GOLDEN}: {len(arrays)} arrays, "
          f"logits {arrays['logits'].shape}, loss {float(arrays['loss']):.6f}")


if __name__ == "__main__":
    main()
