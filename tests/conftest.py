"""Test configuration: run on CPU with 8 virtual devices.

This emulates a TPU v5e-8 mesh for sharding tests without TPU hardware
(SURVEY.md section 4: multi-device tests via
xla_force_host_platform_device_count).

Note: this environment's axon sitecustomize force-registers a remote TPU
backend and sets jax_platforms="axon,cpu" at interpreter startup, which would
route every test compile through the remote tunnel (~minutes per compile).
We counter-update the config to plain "cpu" before any computation runs.
"""

import os

# Small face-chunk unroll: much faster XLA:CPU compiles for the tiny scenes
# used in tests (see dmesh_renderer_tpu/ops/tri_oracle.py).
os.environ.setdefault("DMRT_CHUNK", "8")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
