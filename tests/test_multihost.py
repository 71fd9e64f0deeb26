"""Multi-process (simulated multi-host) pipeline test.

Spawns 2 python processes that `jax.distributed.initialize` against a local
coordinator with 2 virtual CPU devices each (global mesh of 4), run the
sharded block-encode step over a global `Mesh`, and verify the collective
reductions and host-0 archive assembly — pod behavior on one machine
(SURVEY §4 multi-node strategy).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from naf_tpu.format import constants as C
from naf_tpu.parallel.block import encode_blocks_sharded, make_blocks
from naf_tpu.parallel.mesh import BLOCK_AXIS

pid = int(sys.argv[2])
devices = jax.devices()
assert len(devices) == 4, devices
mesh = Mesh(np.asarray(devices), (BLOCK_AXIS,))

# identical input everywhere; each process feeds its local block shards
rng = np.random.default_rng(0)
rows = []
for i in range(16):
    seq = rng.choice(np.frombuffer(b"ACGTacgtNn", np.uint8),
                     size=int(rng.integers(30, 90)))
    rows.append(b">r%d c\n" % i + seq.tobytes() + b"\n")
body = np.frombuffer(b"".join(rows), np.uint8)[1:]

blocks, prev = make_blocks(body, 4)
sharding = NamedSharding(mesh, P(BLOCK_AXIS))

def to_global(arr):
    # each process owns the shards for its addressable devices
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])

blocks_d = to_global(blocks)
prev_d = to_global(prev)

outs = encode_blocks_sharded(blocks_d, prev_d,
                             seq_type=C.SEQ_TYPE_DNA, mesh=mesh)
# replicated reductions are identical on every host
hist_seq = np.asarray(jax.device_get(outs[7].addressable_data(0)))
n_rec = int(np.asarray(jax.device_get(outs[11].addressable_data(0)))[0])
counts_local = np.concatenate(
    [np.asarray(d.data) for d in outs[1].addressable_shards])

# host gather: per-block char counts to every process (rides the
# coordinator on CPU, ICI/DCN on a pod)
counts_global = multihost_utils.process_allgather(counts_local)
total_chars = int(counts_global.sum())
assert n_rec + 1 == 16, n_rec

# full end-to-end multihost archive == single-host archive
from naf_tpu.parallel.multihost import encode_multihost
from naf_tpu.pipeline.encoder import EncodeOptions, encode

data = b"".join(rows)
blob, stats = encode_multihost(data, EncodeOptions(level=1))
host_blob, _ = encode(data, EncodeOptions(level=1))
assert blob == host_blob, "multihost archive != host archive"

print(f"proc{pid}: OK n_rec={n_rec + 1} chars={total_chars} "
      f"archive={len(blob)}B "
      f"hist_nonzero={int((hist_seq != 0).sum())}")
"""


@pytest.mark.skipif(os.environ.get("NAF_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    w = tmp_path / "worker.py"
    w.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(REPO)
    procs = [
        subprocess.Popen([sys.executable, str(w), coord, str(i)],
                         env=env, cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (out.decode()[-500:], err.decode()[-2000:])
        assert b"OK n_rec=16" in out, out
