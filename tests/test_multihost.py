"""Multi-process (simulated multi-host) junction enumeration: spawn two
processes with 2 CPU devices each, run the distributed step over the
4-device global mesh, and compare against the single-process result."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, pickle, sys
proc_id = int(sys.argv[1])
n_proc = int(sys.argv[2])
out_path = sys.argv[3]
port = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=n_proc,
    process_id=proc_id,
)
import numpy as np
from sibeliaz_tpu.core import alphabet
from sibeliaz_tpu.parallel import multihost

rng = np.random.default_rng(5)
base = alphabet.decode(rng.integers(0, 4, size=3000).astype(np.uint8))
mut = base.copy()
for p in np.flatnonzero(rng.random(len(mut)) < 0.01):
    mut[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
seqs = [base, mut]
recs = multihost.build_junctions_multihost(seqs, 15)
if proc_id == 0:
    with open(out_path, "wb") as f:
        pickle.dump([(r.pos, r.ids) for r in recs], f)
"""


@pytest.mark.skipif(
    os.environ.get("SIBELIAZ_SKIP_MULTIPROC") == "1",
    reason="multi-process CPU collectives disabled",
)
def test_two_process_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out = tmp_path / "result.pkl"
    port = "19355"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(out), port],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            p.wait(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
    for p in procs:
        if p.returncode != 0:
            err = p.stderr.read().decode()[-2000:]
            pytest.fail(f"worker failed rc={p.returncode}\n{err}")

    with open(out, "rb") as f:
        multi = pickle.load(f)

    # single-process reference
    from sibeliaz_tpu.core import alphabet
    from sibeliaz_tpu.graph import construct

    rng = np.random.default_rng(5)
    base = alphabet.decode(rng.integers(0, 4, size=3000).astype(np.uint8))
    mut = base.copy()
    for pidx in np.flatnonzero(rng.random(len(mut)) < 0.01):
        mut[pidx] = alphabet.decode(np.uint8(rng.integers(0, 4)))
    single = construct.build_junctions([base, mut], 15)
    assert len(single) == len(multi)
    for s, (pos, ids) in zip(single, multi):
        assert np.array_equal(s.pos, pos)
        assert np.array_equal(s.ids, ids)
