# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU hardware (SURVEY.md §4 item 5).
#
# NOTE: this host's sitecustomize registers a remote-TPU ("axon") PJRT
# plugin at interpreter start and pins jax_platforms itself, so setting
# JAX_PLATFORMS in os.environ here is too late — the config must be
# updated through the jax API after import.  jax>=0.8 also replaced
# --xla_force_host_platform_device_count with the jax_num_cpu_devices
# config.
import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    One full-suite process accumulates hundreds of XLA CPU programs;
    past ~70% of the suite the next big compile (adaptive+regeneration)
    segfaulted INSIDE the XLA CPU compiler (observed twice at the same
    test; the same test passes solo and in any shorter prefix).
    Releasing caches per module keeps the process footprint flat and
    costs only a few recompiles of fixtures shared across modules."""
    yield
    jax.clear_caches()
