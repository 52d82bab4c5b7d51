"""Multi-host smoke: two OS processes joined via jax.distributed on the CPU
backend, each contributing virtual devices to one global mesh, running a
psum'd sharded computation through epnet_tpu.parallel.mesh helpers.

The reference never goes multi-host (DataParallel is single-process,
train_rcnn.py:221-222); this pins OUR extension — initialize_distributed ->
global mesh -> data-sharded global array -> jit with cross-process
reduction — actually working across processes, not just wrapping
jax.distributed.initialize (VERDICT r1 item 10).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=2')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    pid = int(sys.argv[1]); port = sys.argv[2]

    sys.path.insert(0, os.getcwd())
    from epnet_tpu.parallel.mesh import (batch_sharding, initialize_distributed,
                                         make_mesh)
    initialize_distributed(coordinator=f'localhost:{port}',
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()   # 2 local x 2 processes

    import jax.numpy as jnp
    import numpy as np
    mesh = make_mesh()
    sh = batch_sharding(mesh)

    # global (8, 16) batch: each process owns rows [4*pid, 4*pid+4)
    local = (np.arange(4, dtype=np.float32)[:, None] + 4 * pid
             + np.zeros((1, 16), np.float32))
    garr = jax.make_array_from_process_local_data(sh, local, (8, 16))

    @jax.jit
    def step(x):
        # global mean: requires a cross-process reduction under GSPMD
        return jnp.mean(x)

    val = float(jax.device_get(step(garr)))
    expect = np.mean(np.arange(8, dtype=np.float32))  # rows 0..7
    assert abs(val - expect) < 1e-6, (val, expect)
    print(f'RESULT {pid} {val}', flush=True)
""")


@pytest.mark.slow
def test_two_process_cpu_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]

    script = tmp_path / 'worker.py'
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, cwd=os.getcwd(), text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('multihost worker timed out')
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out[-3000:]}'
        assert f'RESULT {i} ' in out, out[-2000:]
