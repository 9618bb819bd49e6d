"""Multi-host DP execution: two local processes join a jax.distributed pod
(CPU backend), build one global mesh, and a jitted DP step all-reduces
gradients across the process boundary (SURVEY §5: jax.distributed over DCN;
reference has no multi-host story at all).

Also covers the loud-failure contract of ``init_distributed``: an explicitly
configured pod that cannot initialize must raise, not silently degrade to
single-host training on 1/N of the data.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, _WORKER, str(pid), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=_REPO)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    results = {}
    for pid, out in enumerate(outs):
        m = re.search(rf"MHOK pid={pid} loss=([\d.eE+-]+) w=(.+)", out)
        assert m, f"worker {pid} printed no result:\n{out}"
        results[pid] = (float(m.group(1)),
                        np.array([float(v) for v in m.group(2).split()]))

    # both processes computed the same replicated result
    assert results[0][0] == pytest.approx(results[1][0], abs=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)

    # ... and it is the GLOBAL value (includes the other process's shard),
    # not what either process would compute from its local data alone
    x0 = (np.arange(6, dtype=np.float32).reshape(2, 3) + 1.0)
    x_global = np.concatenate([x0, 2.0 * x0])
    w = np.ones(3, np.float32)
    loss_global = np.mean((x_global @ w) ** 2)
    assert results[0][0] == pytest.approx(float(loss_global), rel=1e-5)
    loss_local0 = np.mean((x0 @ w) ** 2)
    assert abs(results[0][0] - loss_local0) > 1.0  # local-only would differ

    g = (2.0 / x_global.shape[0]) * (x_global.T @ (x_global @ w))
    np.testing.assert_allclose(results[0][1], w - 0.01 * g, rtol=1e-4)


def test_init_distributed_explicit_failure_raises():
    """A misconfigured-but-explicit pod must raise (VERDICT r2: the catch-all
    except made a broken pod silently train single-host).

    An unreachable coordinator is aborted in C++ by the coordination client
    itself (already loud); the silent-degrade hazard is Python-level
    initialize failures, exercised here with an under-specified pod config.
    """
    code = (
        "import sys, os; sys.path.insert(0, %r)\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from crdr_tpu.parallel.distributed import init_distributed\n"
        "try:\n"
        "    init_distributed('localhost:1', None, None)\n"
        "except RuntimeError as e:\n"
        "    assert 'explicitly configured' in str(e), e\n"
        "    print('RAISED-AS-EXPECTED')\n"
    ) % _REPO
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], text=True, env=env,
                         capture_output=True, timeout=180, cwd=_REPO)
    assert "RAISED-AS-EXPECTED" in out.stdout, (out.stdout, out.stderr)
