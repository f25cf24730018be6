"""Multi-process jax.distributed wiring test (SURVEY §2.3 / ref
utils/distributed_init.py:7-67): two real OS processes form a cluster over a
local coordinator, see each other's devices, and a cross-process psum
produces the global device count.  The CPU analogue of a 2-host TPU launch.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, os.getcwd())
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from mc_nerf_tpu.parallel.distributed import initialize_distributed

    addr, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    initialize_distributed(
        coordinator_address=addr, num_processes=n_proc, process_id=pid
    )
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.local_device_count() == 2

    import jax.numpy as jnp

    # cross-process collective: psum of ones over every global device
    total = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        jnp.ones((jax.local_device_count(),))
    )
    print("PSUM_TOTAL", float(total[0]), flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_auto_init_ignores_single_worker_hostnames(monkeypatch):
    """A one-entry TPU_WORKER_HOSTNAMES (set by single-chip TPU runtimes,
    including this image's plugin) is not a cluster: auto mode must not
    touch jax.distributed at all."""
    import jax

    from mc_nerf_tpu.parallel import distributed as dist

    for k in dist._CLUSTER_ENV_HINTS:
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **kw: calls.append((a, kw))
    )
    dist.initialize_distributed()
    assert calls == []


def test_auto_init_runs_before_backend_probe(monkeypatch):
    """With a real multi-host hint, initialize() must be attempted BEFORE
    any backend-initializing probe (jax.process_count would initialize the
    XLA backend and make initialize() fail on a real cluster)."""
    import jax

    from mc_nerf_tpu.parallel import distributed as dist

    for k in dist._CLUSTER_ENV_HINTS:
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    order = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **kw: order.append("init")
    )
    monkeypatch.setattr(
        dist.jax, "process_count", lambda: order.append("probe") or 1
    )
    monkeypatch.setattr(dist, "_log_topology", lambda: None)
    dist.initialize_distributed()
    assert order and order[0] == "init"


def test_auto_init_raises_on_multihost_failure(monkeypatch):
    """A genuine initialize() failure on a multi-entry TPU_WORKER_HOSTNAMES
    cluster must raise, not silently degrade to N independent
    single-process runs (each would train alone and clobber the others'
    checkpoints)."""
    import jax

    from mc_nerf_tpu.parallel import distributed as dist

    for k in dist._CLUSTER_ENV_HINTS:
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")

    def fail(*a, **kw):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", fail)
    monkeypatch.setattr(dist.jax, "process_count", lambda: 1)
    with pytest.raises(RuntimeError, match="multi-host"):
        dist.initialize_distributed()


def test_auto_init_warns_on_weak_hint_failure(monkeypatch, caplog):
    """A weak hint (e.g. SLURM_JOB_ID set on a single-node allocation) may
    legitimately fail to form a cluster — that stays a warning."""
    import logging as _logging

    import jax

    from mc_nerf_tpu.parallel import distributed as dist

    for k in dist._CLUSTER_ENV_HINTS:
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("SLURM_JOB_ID", "12345")

    def fail(*a, **kw):
        raise RuntimeError("no cluster")

    monkeypatch.setattr(jax.distributed, "initialize", fail)
    monkeypatch.setattr(dist.jax, "process_count", lambda: 1)
    with caplog.at_level(_logging.WARNING):
        dist.initialize_distributed()  # must not raise
    assert any("auto-init failed" in r.message for r in caplog.records)


@pytest.mark.slow
def test_two_process_cluster(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    addr = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.getcwd(), env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        # 2 processes x 2 local devices -> global psum of ones == 4
        assert "PSUM_TOTAL 4.0" in out, out
