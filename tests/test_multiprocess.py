"""True multi-PROCESS execution of the distributed comm paths (SURVEY.md
§2.4; VERDICT r2 item 4): 2 subprocesses × 2 fake CPU devices, gloo
cross-process collectives, one real DP train step — loss and updated-param
checksum must match the single-process run on the same global batch.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    from runet_tpu.parallel import comm
    from tests.mp_common import build_state_and_batch, run_one_step

    mesh = comm.make_mesh(4)
    state, images, labels = build_state_and_batch()
    return run_one_step(mesh, state, images, labels)


def _single_process_multi_reference():
    from runet_tpu.parallel import comm
    from tests.mp_common import (
        build_multi_batch,
        build_state_and_batch,
        run_multi_chunk,
    )

    mesh = comm.make_mesh(4)
    state = build_state_and_batch()[0]
    images, labels = build_multi_batch()
    return run_multi_chunk(mesh, state, images, labels)


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_child.py"), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out}"

    results = {}
    multi_results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, loss, ck = line.split()
                results[int(pid)] = (float(loss), float(ck))
            elif line.startswith("RESULTM "):
                _, pid, loss, ck = line.split()
                multi_results[int(pid)] = (float(loss), float(ck))
    assert set(results) == {0, 1}, f"missing child results: {outs}"
    assert set(multi_results) == {0, 1}, f"missing multi-chunk results: {outs}"

    # Both processes computed the same replicated loss/params.
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)
    np.testing.assert_allclose(multi_results[0][0], multi_results[1][0], rtol=1e-6)
    np.testing.assert_allclose(multi_results[0][1], multi_results[1][1], rtol=1e-6)

    # And they match the single-process run on the same global batch.
    ref_loss, ref_ck = _single_process_reference()
    np.testing.assert_allclose(results[0][0], ref_loss, rtol=2e-5)
    np.testing.assert_allclose(results[0][1], ref_ck, rtol=2e-5)

    # Multi-step chunk: the axis-1-batch make_array_from_process_local_data
    # path matches the single-process scan on the same superbatch.
    mref_loss, mref_ck = _single_process_multi_reference()
    np.testing.assert_allclose(multi_results[0][0], mref_loss, rtol=2e-5)
    np.testing.assert_allclose(multi_results[0][1], mref_ck, rtol=2e-5)
