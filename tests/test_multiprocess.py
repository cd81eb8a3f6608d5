"""True multi-PROCESS execution: two OS processes, each owning 4 virtual
CPU devices, joined through jax.distributed into one 8-device world —
the hermetic analog of two TPU hosts on DCN (SURVEY.md §4's "multi-node
without a real cluster", taken one level further than the virtual-device
mesh: real coordinator, real cross-process collectives).

Each worker builds the hybrid (dcn, data, model) mesh, runs a
TP+DP-sharded jitted forward on globally-sharded inputs, and reports a
checksum; the parent compares both workers' checksums to the
single-process reference."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

coord, pid = sys.argv[1], int(sys.argv[2])

from rten_tpu.parallel.distributed import (initialize_multihost,
                                           make_hybrid_mesh)

initialize_multihost(coordinator_address=coord, num_processes=2,
                     process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())   # 4 local x 2

from jax.sharding import NamedSharding, PartitionSpec as P
import jax.numpy as jnp
from rten_tpu.models.transformer import TransformerConfig, TransformerLM
from rten_tpu.parallel import shard_params

cfg = TransformerConfig.tiny_test(use_pallas=False)
model = TransformerLM(cfg)
params = model.init_params(jax.random.PRNGKey(0))

mesh = make_hybrid_mesh(dcn_data=2, data=2, model=2)
params = shard_params(params, mesh)

# Global batch 4, sharded over (dcn, data): each process feeds its local
# shard of the same global array.
ids_global = np.random.RandomState(0).randint(0, 128, (4, 8))
sharding = NamedSharding(mesh, P(("dcn", "data"), None))
ids = jax.make_array_from_callback(
    ids_global.shape, sharding,
    lambda idx: jnp.asarray(ids_global[idx], jnp.int32))

@jax.jit
def fwd(p, t):
    return model.forward(p, t)[0]

with mesh:
    logits = fwd(params, ids)
# Cross-process reduction to a fully-replicated scalar checksum.
checksum = float(jax.jit(lambda x: jnp.sum(x * x),
                         out_shardings=NamedSharding(mesh, P()))(logits))
print(json.dumps({"pid": pid, "checksum": checksum}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_forward():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        if p.returncode != 0:
            msg = err.decode()[-2000:]
            if "distributed" in msg.lower() and "support" in msg.lower():
                pytest.skip(f"jax.distributed unsupported here: {msg}")
            pytest.fail(f"worker failed: {msg}")
        line = next(l for l in out.decode().splitlines()
                    if l.strip().startswith('{"pid"'))
        outs.append(json.loads(line))

    # Both processes computed the same global checksum.
    assert abs(outs[0]["checksum"] - outs[1]["checksum"]) < 1e-3

    # Single-process reference.
    import jax
    import jax.numpy as jnp
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM

    cfg = TransformerConfig.tiny_test(use_pallas=False)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    ids = np.random.RandomState(0).randint(0, 128, (4, 8))
    logits, _ = model.forward(params, jnp.asarray(ids, jnp.int32))
    want = float(jnp.sum(logits * logits))
    assert abs(outs[0]["checksum"] - want) / max(abs(want), 1.0) < 1e-3
