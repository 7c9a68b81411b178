"""Test config: run JAX on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment so sharding tests exercise
real collectives without TPU hardware. Must set flags before jax import.
"""

import os

# NB: the axon sitecustomize force-sets JAX_PLATFORMS=axon; only
# jax.config.update after import actually wins on this image.
# keep test processes out of the shared persistent XLA cache (tests that
# drive the CLI/tool mains would enable it process-wide and race a
# concurrently running TPU bench's cache writes)
os.environ.setdefault("CRABML_JAX_CACHE", "off")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("CRABML_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_FIXTURE = pathlib.Path("/root/reference/testdata/tinyllamas-stories-260k-f32.gguf")


@pytest.fixture(scope="session")
def stories260k_path():
    if not REFERENCE_FIXTURE.exists():
        pytest.skip("reference 260k fixture not available")
    return str(REFERENCE_FIXTURE)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound in-process XLA:CPU compile-state growth.

    The full suite (~390 tests, hundreds of compiled executables on the
    virtual 8-device CPU mesh) started segfaulting inside XLA:CPU
    backend_compile_and_load once it grew past ~300 tests in one process
    (late r4; faulthandler stack in jax._src.compiler, position shifts
    with collection ordering — an upstream compiler-state bug, not a test
    failure: every crashing neighborhood passes in isolation). Dropping
    compiled executables between modules keeps the process under the
    threshold; measured overhead ~0 (recompiles amortize per module)."""
    yield
    import jax

    jax.clear_caches()
