"""Child process for tests/test_multiprocess.py — one REAL multi-process DP
train step (SURVEY.md §2.4; VERDICT r2 item 4).

Each of 2 processes owns 2 fake CPU devices (global mesh = 4). Exercises the
paths that only exist multi-process: ``comm.init_distributed`` (explicit
args), ``comm.make_hybrid_mesh()`` DEFAULTS (n_dcn = process_count), and the
``jax.make_array_from_process_local_data`` branch of ``comm.shard_batch``.
Prints loss + a param checksum for the parent to compare against the
single-process run on the same global batch.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from runet_tpu.parallel import comm  # noqa: E402

assert comm.init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert len(jax.devices()) == 4

import numpy as np  # noqa: E402

from tests.mp_common import build_state_and_batch, run_one_step  # noqa: E402

mesh = comm.make_hybrid_mesh()  # defaults: (dcn=2 processes, ici=2 local)
assert mesh.axis_names == (comm.DCN_AXIS, comm.ICI_AXIS)
assert mesh.devices.shape == (2, 2)

from tests.mp_common import build_multi_batch, run_multi_chunk  # noqa: E402

state, images, labels = build_state_and_batch()
# This process contributes its LOCAL half of the global batch.
local = slice(2 * pid, 2 * pid + 2)
loss, checksum = run_one_step(mesh, state, images[local], labels[local])
print(f"RESULT {pid} {loss:.10f} {checksum:.10f}", flush=True)

# Multi-step chunk (steps_per_dispatch): the same global superbatch, local
# slice on axis 1, scan of K=2 micro-steps in one dispatch.
state2 = build_state_and_batch()[0]  # fresh params for the chunk run
mi, ml = build_multi_batch()
mloss, mck = run_multi_chunk(mesh, state2, mi[:, local], ml[:, local])
print(f"RESULTM {pid} {mloss:.10f} {mck:.10f}", flush=True)
