"""Multi-process jax.distributed smoke: 2 processes x 2 CPU devices form
a 4-device global mesh; global_batch assembles per-host data into one
sharded array (the DCN data-parallel path, SURVEY §2.4/§5.8)."""
import subprocess
import sys

_WORKER = r'''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
from egoscaler_tpu.parallel.distributed import initialize, global_batch
info = initialize("localhost:12981", 2, pid)
assert info["process_count"] == 2 and info["global_devices"] == 4, info
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
mesh = Mesh(np.array(jax.devices()).reshape(4, 1), ("data", "model"))
local = {"x": np.full((2, 3), pid, np.float32)}
g = global_batch(mesh, local)
assert g["x"].shape == (4, 3)
assert float(jnp.sum(g["x"])) == 6.0
print("WORKER_OK", pid)
'''


def test_two_process_distributed():
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", "-c", _WORKER, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out
    assert all("WORKER_OK" in o for o in outs)
