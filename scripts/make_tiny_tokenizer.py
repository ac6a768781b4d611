"""Train + vendor the tiny BPE tokenizer used by the real-tokenizer e2e tests.

VERDICT r2 #8: every test drove the processor through a FakeTokenizer; the
``AutoTokenizer`` path (reference ``Model/utils.py:153``) had never executed
against a real trained tokenizer. This trains a genuine byte-level BPE
(llama-style special tokens) on the repo's own documentation text and writes
a loadable HF tokenizer directory to ``tests/assets/tiny_tokenizer/`` —
a few kB, committed, no network.

Run (regenerates the committed asset): python scripts/make_tiny_tokenizer.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
from transformers import PreTrainedTokenizerFast

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "assets", "tiny_tokenizer")
VOCAB = 1024


def corpus():
    root = os.path.join(os.path.dirname(__file__), "..")
    for name in ("README.md", "SURVEY.md", "BASELINE.md", "PARITY.md",
                 "docs/serving.md", "docs/checkpoints.md"):
        p = os.path.join(root, name)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                yield f.read()


def main():
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=VOCAB,
        special_tokens=["<|begin_of_text|>", "<|end_of_text|>", "<|pad|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(corpus(), trainer=trainer)

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<|begin_of_text|>",
        eos_token="<|end_of_text|>",
        pad_token="<|pad|>",
        model_max_length=131072,
    )
    os.makedirs(OUT, exist_ok=True)
    fast.save_pretrained(OUT)
    print(f"vocab {fast.vocab_size} -> {os.path.abspath(OUT)}")
    enc = fast("hello decode tokens per second", add_special_tokens=False)
    print("roundtrip:", fast.decode(enc["input_ids"]))


if __name__ == "__main__":
    main()
