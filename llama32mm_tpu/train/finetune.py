"""LoRA fine-tune CLI.

The reference ships the LoRA pieces but no trainer (SURVEY §3.4 — the README
describes an ``apply_lora`` recipe and a user-supplied loop). This CLI is that
loop, TPU-native: jit-compiled adapter-only training steps over the labels/
shifted-CE path (``Model/model.py:431-438`` semantics), with adapter-only
checkpoint saves (README "LoRA fine-tuning").

Data: either a JSONL file of ``{"image": path, "prompt": str, "answer": str}``
records (``--data``, the reference's captioning-tune shape), or a text corpus
(``--text-data``: one document per line, or JSONL with a ``text`` field)
packed through ``train/data.py`` — EOS-separated static batches, deterministic
shuffling, host→device prefetch. Without either a synthetic random batch is
used (smoke mode).

``--accum-steps A`` accumulates A microbatches per optimizer update
(``train/accum.py``, big-batch-exact). ``--run-dir DIR`` turns on rotating
step checkpoints (``io.TrainCheckpointManager``) of the train state AND the
data-stream position; rerunning with the same ``--run-dir`` auto-resumes
both from the latest step.

Usage:
  python -m llama32mm_tpu.train.finetune --hf-weights weights/11b \
      --data train.jsonl --rank 16 --steps 100 --save adapters.safetensors
  python -m llama32mm_tpu.train.finetune --hf-weights weights/11b \
      --text-data corpus.txt --batch-size 4 --accum-steps 4 \
      --run-dir runs/tune1 --steps 1000
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="LoRA fine-tuning for the TPU-native VLM.")
    p.add_argument("--hf-weights", default=None,
                   help="HF checkpoint dir; omit for a tiny random-init smoke run.")
    p.add_argument("--data", default=None, help="JSONL of {image, prompt, answer}.")
    p.add_argument("--text-data", default=None,
                   help="Text corpus for packed causal-LM tuning: one document "
                        "per line, or JSONL with a 'text' field.")
    p.add_argument("--batch-size", type=int, default=1,
                   help="rows per microbatch (packed text path)")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="microbatches accumulated per optimizer update")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches staged on device ahead of the step")
    p.add_argument("--run-dir", default=None,
                   help="rotating step-checkpoint dir; auto-resumes train + "
                        "data state from the latest step")
    p.add_argument("--save-every", type=int, default=50,
                   help="checkpoint cadence in steps (with --run-dir)")
    p.add_argument("--rank", type=int, default=16)
    p.add_argument("--alpha", type=float, default=16.0)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--max-seq-len", type=int, default=2048)
    p.add_argument("--save", default="lora_adapters.safetensors")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    return p.parse_args(argv)


def _iter_jsonl_batches(path, processor, tokenizer, max_seq_len):
    from PIL import Image

    import numpy as np

    with open(path, encoding="utf-8") as f:
        records = [json.loads(line) for line in f if line.strip()]
    if not records:
        sys.exit(f"No records in {path}")
    while True:
        for rec in records:
            image = Image.open(rec["image"]).convert("RGB")
            inputs = processor([rec["prompt"]], [image], padding="max_length")
            answer_ids = tokenizer(rec["answer"]).input_ids
            ids = inputs["input_ids"][0].tolist() + list(answer_ids)
            ids = ids[:max_seq_len]
            labels = [-100] * inputs["input_ids"].shape[1] + list(answer_ids)
            labels = labels[:max_seq_len]
            pad = max_seq_len - len(ids)
            mask = [1] * len(ids) + [0] * pad
            ids = ids + [0] * pad
            labels = labels + [-100] * pad
            yield {
                "input_ids": np.asarray([ids], np.int32),
                "pixel_values": np.asarray(inputs["pixel_values"], np.float32),
                "attention_mask": np.asarray([mask], np.int32),
                "labels": np.asarray([labels], np.int32),
            }


def _load_text_docs(path, tokenizer):
    """Tokenize a text corpus: one document per line, or JSONL with 'text'."""
    docs = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            text = line
            if line.startswith("{"):
                try:
                    text = json.loads(line).get("text", "")
                except json.JSONDecodeError:
                    pass
            ids = tokenizer(text, add_special_tokens=False).input_ids
            if ids:
                docs.append(ids)
    if not docs:
        sys.exit(f"No non-empty documents in {path}")
    return docs


def main(argv=None) -> None:
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from llama32mm_tpu.train.lora import (
        init_lora_params,
        make_lora_train_step,
        save_lora_adapters,
    )

    use_packed = args.text_data is not None
    it = None

    if args.hf_weights:
        from llama32mm_tpu.io.checkpoint import load_hf_model
        from llama32mm_tpu.preprocess.processor import MllamaImageProcessor

        model, tokenizer = load_hf_model(args.hf_weights)
        cfg, params = model.config, model.params
        processor = MllamaImageProcessor(
            tokenizer, cfg.text_config.num_image_tokens, cfg.vision_config.image_size
        )
        if use_packed:
            from llama32mm_tpu.train.data import PackedBatchIterator

            eos = tokenizer.eos_token_id
            if eos is None:
                sys.exit("--text-data needs a tokenizer with an eos token")
            docs = _load_text_docs(args.text_data, tokenizer)
            rows = args.batch_size * args.accum_steps
            it = PackedBatchIterator(
                docs, rows, args.max_seq_len, eos, seed=args.seed,
                ignore_index=cfg.ignore_index,
            )
        elif args.data:
            batches = _iter_jsonl_batches(args.data, processor, tokenizer, args.max_seq_len)
        else:
            sys.exit("--data or --text-data is required with --hf-weights")
    else:
        # smoke mode: tiny random model + synthetic batch
        from llama32mm_tpu import init_vlm_params, tiny_mllama_config

        cfg = tiny_mllama_config()
        params = init_vlm_params(jax.random.PRNGKey(args.seed), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size - 10)
        ids = ids.at[:, :4].set(cfg.image_token_index)
        batch = {
            "input_ids": ids,
            "pixel_values": jax.random.normal(jax.random.PRNGKey(2), (2, 3, 28, 28)),
            "attention_mask": jnp.ones_like(ids),
            "labels": ids.at[:, :4].set(-100),
        }
        batches = iter(lambda: batch, None)  # infinite same batch

    lora = init_lora_params(
        jax.random.PRNGKey(args.seed + 1), cfg.text_config, rank=args.rank, alpha=args.alpha
    )
    init_state, step_fn = make_lora_train_step(
        cfg, learning_rate=args.lr, lora_dropout=args.dropout,
        accum_steps=args.accum_steps if use_packed else 1,
    )
    step_fn = jax.jit(step_fn)
    state = init_state(lora)

    def _data_state(ds):
        from llama32mm_tpu.train.data import DataState

        return DataState(*(jnp.asarray(int(x)) for x in ds))

    mgr = None
    start_step = 0
    if args.run_dir:
        from llama32mm_tpu.io import TrainCheckpointManager, abstract_state

        mgr = TrainCheckpointManager(args.run_dir, max_to_keep=3)
        if mgr.latest_step() is not None:
            template = {"train": state}
            if use_packed:
                template["data"] = _data_state(it.state)
            restored = mgr.restore(abstract_state(template))
            state = restored["train"]
            start_step = int(state.step)
            if use_packed:
                from llama32mm_tpu.train.data import PackedBatchIterator

                it = PackedBatchIterator.from_state(
                    docs, rows, args.max_seq_len, eos, restored["data"],
                    ignore_index=cfg.ignore_index,
                )
            print(f"Resumed {args.run_dir} at step {start_step}")

    if use_packed:
        from llama32mm_tpu.train.data import prefetch_to_device

        def with_state(inner):
            # pair each batch with the stream position AFTER it, so a
            # checkpoint taken at step i resumes at exactly batch i+1 even
            # though prefetch has already pulled further ahead
            while True:
                b = next(inner)
                yield b, _data_state(inner.state)

        stream = prefetch_to_device(with_state(it), size=args.prefetch)

    rng = jax.random.PRNGKey(args.seed + 2)
    dstate = None
    for i in range(start_step, args.steps):
        if use_packed:
            batch, dstate = next(stream)
            if args.accum_steps > 1:
                batch = {
                    k: v.reshape(args.accum_steps, args.batch_size, *v.shape[1:])
                    for k, v in batch.items()
                }
        else:
            batch = next(batches)
        state, loss = step_fn(params, state, batch, jax.random.fold_in(rng, i))
        if mgr is not None and ((i + 1) % args.save_every == 0 or i == args.steps - 1):
            tree = {"train": state}
            if dstate is not None:
                tree["data"] = dstate
            mgr.save(i + 1, tree, force=i == args.steps - 1)
        if i % args.log_every == 0 or i == args.steps - 1:
            print(f"step {i:5d}  loss {float(loss):.4f}")
    if mgr is not None:
        mgr.wait()

    save_lora_adapters(args.save, state.lora)
    print(f"Saved adapters to {args.save}")


if __name__ == "__main__":
    main()
