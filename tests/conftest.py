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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
