"""Multi-process jax.distributed bring-up smoke test (SURVEY §2.9).

Spawns TWO real processes on one host (2 virtual CPU devices each),
initializes the jax.distributed runtime through
parallel.distributed.initialize, builds a global 4-device mesh, and runs
a tiny render_sharded on it — proving the multi-host init path works,
not just the single-process virtual mesh (round-1 verdict item 10).
Falls back to skip when the CPU cross-process collective backend is
unavailable in this jax build.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from pathtracing_tpu.parallel.distributed import initialize, is_coordinator
info = initialize(coordinator_address="127.0.0.1:" + port,
                  num_processes=2, process_id=pid)
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info
import numpy as np
from pathtracing_tpu.scenes import furnace
from pathtracing_tpu.parallel.mesh import make_mesh, render_sharded
from pathtracing_tpu.integrators.path import RenderConfig
from pathtracing_tpu.sensor.film import finalize
scene, cam, meta = furnace(resolution=(8, 8))
cfg = RenderConfig(spp=2, max_depth=2, rays_per_batch=64)
mesh = make_mesh()          # spans both processes' devices
assert mesh.devices.size == 4
film = render_sharded(scene, cam, meta, cfg, mesh=mesh)
img = np.asarray(finalize(film))    # replicated output: every host has it
assert np.isfinite(img).all() and img.mean() > 0.01
np.save(out, img)
print("WORKER_OK", pid)
"""


def test_two_process_distributed_render(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "JAX_NUM_CPU_DEVICES": "2"}
    outs = [tmp_path / f"img{i}.npy" for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, port, str(i), str(outs[i])],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, cwd="/root/repo") for i in range(2)]
    results = [p.communicate(timeout=560) for p in procs]
    rcs = [p.returncode for p in procs]
    logs = "\n---\n".join(o + e for o, e in results)
    if any(rc != 0 for rc in rcs):
        low = logs.lower()
        if ("collectives" in low or "gloo" in low or "unimplemented" in low
                or "cross-host" in low or "not available" in low):
            pytest.skip(f"CPU cross-process collectives unavailable: "
                        f"{logs[-500:]}")
        raise AssertionError(logs[-4000:])
    img0 = np.load(outs[0])
    img1 = np.load(outs[1])
    # replicated film: both processes hold the identical image
    np.testing.assert_array_equal(img0, img1)

    # and it matches the single-process render of the same config
    import jax
    from pathtracing_tpu.scenes import furnace
    from pathtracing_tpu.integrators.path import RenderConfig
    from pathtracing_tpu.parallel.mesh import make_mesh, render_sharded
    from pathtracing_tpu.sensor.film import finalize
    scene, cam, meta = furnace(resolution=(8, 8))
    cfg = RenderConfig(spp=2, max_depth=2, rays_per_batch=64)
    ref = np.asarray(finalize(render_sharded(scene, cam, meta, cfg,
                                             mesh=make_mesh(4))))
    np.testing.assert_allclose(img0, ref, rtol=2e-4, atol=2e-5)
