"""11B north-star shapes in int4 serving mode on one chip.

Random weights generated directly in the packed-uint8 int4 format (the
bf16/int8 stacks never exist), then a captioning-shaped decode is measured,
along with the weight HBM footprint. Since the shift-free unpack kernel
(ops/pallas/gemv.py::_int4_kernel_post) this is the FASTEST 11B mode, not
just the smallest. The measurement lives in bench.py (bench_11b_int4) so the
driver-captured round bench reports it; this script is the standalone entry.

Run: python -u scripts/bench_int4_11b.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import CACHE_LEN, bench_11b_int4, resolve_hbm_gbps  # noqa: E402
from llama32mm_tpu.configs import llama32_11b_vision_config  # noqa: E402


def main():
    cfg = llama32_11b_vision_config(max_cache_length=CACHE_LEN)
    mixed = "--mixed" in sys.argv
    print(json.dumps(bench_11b_int4(cfg, resolve_hbm_gbps(), mixed=mixed)),
          flush=True)


if __name__ == "__main__":
    main()
