"""Test configuration: run everything on a virtual 8-device CPU mesh.

Pallas kernels run in interpreter mode off-TPU (auto-detected by the
wrappers), so the full kernel + sharding surface is testable without
hardware. Set SINK_ATTN_TEST_TPU=1 to run the suite on a real TPU instead.
"""

import os

if not os.environ.get("SINK_ATTN_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("SINK_ATTN_TEST_TPU"):
    # The axon TPU plugin can override JAX_PLATFORMS; force CPU explicitly.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
