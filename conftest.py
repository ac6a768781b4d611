"""Repo-root conftest: make the package importable and force the CPU backend
with 8 virtual devices for GSPMD tests (SURVEY.md §4 'Distributed').

The axon TPU plugin (when present) forces ``jax_platforms`` at interpreter
start, so env vars alone don't stick — override the jax config before any
backend initializes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
