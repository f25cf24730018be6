"""Multi-process END-TO-END training test (VERDICT r3 ask #4).

The pieces — distributed init, psum, shard_map, rank gating — are each
tested; this exercises their COMPOSITION: two real OS processes (2 local
CPU devices each) form a cluster and drive a full ``Engine.train()`` on a
shared tiny scene, including rank-gated observability, multihost orbax
checkpointing, resume, and loss parity with a single-process 4-device run
of the identical config.  This is what a real 2-host TPU launch exercises
first (ref ``utils/distributed_init.py:7-67``, ``main.py:60-62``).
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

    addr, n_proc, pid, scene_dir, out_root = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5]
    )
    if n_proc > 1:
        initialize_distributed(
            coordinator_address=addr, num_processes=n_proc, process_id=pid
        )
        assert jax.process_count() == n_proc

    import numpy as np
    sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
    from test_engine import small_cfg
    from mc_nerf_tpu.train.engine import Engine

    cfg = small_cfg(scene_dir, out_root)
    cfg = cfg.replace(parallel=cfg.parallel.__class__(data_parallel=4))
    engine = Engine(cfg)
    state = engine.train()
    # params are replicated: every process must see the identical values
    flat = np.concatenate([
        np.asarray(x).ravel() for x in jax.tree.leaves(state.params)
    ])
    print(f"PARAMS_SUM {float(np.abs(flat).sum()):.6f}", flush=True)
    print(f"FINAL_STEP {int(state.step)}", flush=True)

    # resume from the written checkpoints restores the final state
    engine2 = Engine(cfg)
    state2 = engine2.train(resume=True)
    flat2 = np.concatenate([
        np.asarray(x).ravel() for x in jax.tree.leaves(state2.params)
    ])
    print(f"RESUME_MATCH {int(np.allclose(flat, flat2, atol=1e-6))}", flush=True)

    # multi-process demo (VERDICT r4 ask #4): the view loop is sharded
    # round-robin over processes; every rank must return the identical
    # result dict and each output file must be written exactly once
    res = Engine(cfg.replace(mode=1)).demo()
    print(f"DEMO_PSNR {res['psnr']:.6f}", flush=True)
    print(f"DEMO_SSIM {res['ssim']:.6f}", flush=True)
    print(f"DEMO_DIR {res['out_dir']}", flush=True)
    print("WORKER_DONE", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(script, addr, n_proc, pid, scene_dir, out_root, env):
    return subprocess.Popen(
        [sys.executable, str(script), addr, str(n_proc), str(pid),
         scene_dir, out_root],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.getcwd(), env=env, text=True,
    )


@pytest.mark.slow
def test_two_process_end_to_end_train(tmp_path):
    # scene is generated once, shared by both processes (and the
    # single-process parity run)
    from mc_nerf_tpu.data.synthetic import make_dataset

    scene_dir = str(tmp_path / "scene" / "Tiny_MP")
    make_dataset(scene_dir, n_train=5, n_val=2, n_test=2, img_h=24, img_w=24,
                 seed=7)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}

    addr = f"127.0.0.1:{_free_port()}"
    out_mp = str(tmp_path / "out_mp")
    procs = [
        _launch(script, addr, 2, pid, scene_dir, out_mp, env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert "WORKER_DONE" in out, out[-4000:]
        assert "RESUME_MATCH 1" in out, out[-4000:]

    def grab(out, key):
        return [l.split()[1] for l in out.splitlines() if l.startswith(key)][0]

    # replicated params identical across ranks
    sums = [float(grab(o, "PARAMS_SUM")) for o in outs]
    assert abs(sums[0] - sums[1]) <= 1e-4 * max(1.0, abs(sums[0])), sums
    steps = {grab(o, "FINAL_STEP") for o in outs}
    assert len(steps) == 1

    # multi-process demo: both ranks agree on the output dir (broadcast
    # stamp) and on the gathered scores; each view file exists exactly once
    demo_dirs = {grab(o, "DEMO_DIR") for o in outs}
    assert len(demo_dirs) == 1, demo_dirs
    demo_dir = demo_dirs.pop()
    import glob as _glob

    preds = _glob.glob(os.path.join(demo_dir, "pred", "*.png"))
    assert len(preds) == 2, preds  # n_test views, one file each
    # exactly one stamped render dir — no per-rank duplicate trees
    prefix = os.path.basename(demo_dir).rsplit("_", 1)[0] + "_"
    stamped = [d for d in os.listdir(os.path.dirname(demo_dir))
               if d.startswith(prefix)]
    assert len(stamped) == 1, stamped
    demo_psnrs = {grab(o, "DEMO_PSNR") for o in outs}
    assert len(demo_psnrs) == 1, demo_psnrs  # allgathered: identical dicts
    psnr_mp = float(demo_psnrs.pop())

    # loss/param parity with a single-process run over the SAME 4-device
    # mesh (identical PRNG keys, identical global batch semantics)
    p = _launch(script, addr, 1, 0, scene_dir, str(tmp_path / "out_sp"), env)
    out_sp, _ = p.communicate(timeout=900)
    assert p.returncode == 0, out_sp[-4000:]
    sum_sp = float(grab(out_sp, "PARAMS_SUM"))
    assert abs(sums[0] - sum_sp) <= 1e-3 * max(1.0, abs(sum_sp)), (
        f"multi-process {sums[0]} vs single-process {sum_sp}"
    )
    # demo parity: the sharded multi-process render scores what the
    # single-process render scores (same replicated params to ~1e-6)
    psnr_sp = float(grab(out_sp, "DEMO_PSNR"))
    assert abs(psnr_mp - psnr_sp) < 0.05, (psnr_mp, psnr_sp)
