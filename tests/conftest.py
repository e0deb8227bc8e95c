"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere (hence module level, and
conftest is imported before test modules collect jax).
"""
import os

# Force CPU: the machine profile exports JAX_PLATFORMS=axon (real TPU via
# tunnel); tests must run on the virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib

import pytest

# The machine's sitecustomize registers and eagerly initializes the 'axon' TPU
# backend in every interpreter — before this conftest runs — which pins jax to
# the TPU even with JAX_PLATFORMS=cpu. Reset backends so tests really run on
# the virtual 8-device CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax._src.xla_bridge._clear_backends()
except Exception:
    pass
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

# Persistent XLA compilation cache: the suite's cost is dominated by CPU
# compiles of the DPT/UNet train+eval programs; repeat runs hit the cache
# and drop from ~13 min to ~3 min.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", "tmp", "xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE
