"""Multi-host bring-up (jax.distributed) for pod-slice rendering.

The reference is a single process with shared-memory atomics — it has no
multi-host story at all (SURVEY.md §2.9).  Here, multi-host = the same
mesh code as parallel/mesh.py over jax.distributed:

    # on every host (e.g. via your cluster launcher):
    from pathtracing_tpu.parallel.distributed import initialize
    initialize()                      # env-driven (TPU pods autodetect)
    mesh = make_mesh()                # now spans all hosts' devices
    film = render_sharded(scene, cam, meta, cfg, mesh=mesh)

Every host builds the identical scene (host-side builds are
deterministic), `make_mesh()` covers the global device set, and
`render_sharded` / `train_step_sharded` need no changes: pixels shard
over the global 'dp' axis, the film psum rides ICI within a slice and
DCN across hosts, and outputs are replicated so any host can write the
image.  This module only wraps initialization + convenience checks; it
cannot be exercised in CI (single host) — see tests for the virtual-mesh
equivalents.
"""
from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """jax.distributed.initialize with TPU-pod autodetection.

    On Cloud TPU pods all three arguments are discovered from the
    environment; pass them explicitly for other clusters."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                local_devices=jax.local_device_count(),
                global_devices=jax.device_count())


def is_coordinator() -> bool:
    return jax.process_index() == 0
