"""Test harness: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

NOTE: this environment force-registers a TPU PJRT plugin via
sitecustomize and pins JAX_PLATFORMS in the ambient env, so the env var
alone is NOT enough — `jax.config.update("jax_platforms", "cpu")` after
import is what actually selects CPU. XLA_FLAGS must still be set before
jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # best effort; see note above
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_sessionstart(session):
    n = len(jax.devices())
    assert jax.devices()[0].platform == "cpu", (
        f"tests must run on CPU, got {jax.devices()[0]}"
    )
    assert n == 8, f"expected 8 virtual CPU devices, got {n}"
