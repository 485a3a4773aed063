"""Test config: run everything on an 8-virtual-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices; the real TPU is
exercised by ``bench.py`` and the driver's compile checks.

NOTE: on this machine the axon TPU plugin ignores the ``JAX_PLATFORMS`` env
var in some paths, so we force the platform BOTH ways: env var before the
import (nersemble_tpu.__init__ mirrors it into jax.config, which stops the
plugin's backend probe from hanging for minutes when the TPU tunnel is
down) and ``jax.config`` after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
