"""Test config: force JAX onto a virtual 8-device CPU mesh.

The reference has no automated tests (SURVEY.md §4); this suite is the
framework's test pyramid: numeric-parity tests against torch CPU, module
shape/jit tests, and multi-device sharding tests that run on the simulated
CPU mesh (`--xla_force_host_platform_device_count=8`).
"""

import os

# Hard override: the session environment pins JAX_PLATFORMS to the real TPU
# tunnel (axon sitecustomize); unit tests must run on the simulated CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
