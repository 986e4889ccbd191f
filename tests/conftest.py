import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU hardware (SURVEY.md §4 item 5).
# NOTE: the host environment pre-sets JAX_PLATFORMS=axon (remote TPU with
# very slow per-op dispatch) — tests must override it, not setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
