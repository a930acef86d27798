"""TRUE multi-process multihost test: two OS processes join one JAX job
via ``jax.distributed.initialize`` (4 virtual CPU devices each -> one
8-device global mesh) and run the exact ``scripts/train.py --multihost``
path end-to-end — per-process dataset shards through ``process_slice``,
global batch assembly through ``Trainer._assemble_multihost``
(``jax.make_array_from_process_local_data``), psum gradients, rank-0
checkpointing.

This is the reference's actual launch topology
(/root/reference/u_net_arch/train_dist.py:499-518: one
torch.distributed process per device, init_method='env://'), which the
single-process tests in test_multihost.py only cover degenerately.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_shapes(root: str) -> None:
    from deep3dpointclouddenoising_tpu.data.meshio import save_off
    from deep3dpointclouddenoising_tpu.data.synthetic import (make_icosphere,
                                                              make_torus)
    for s in ("train", "val", "test", "qualitative_test"):
        os.makedirs(os.path.join(root, s), exist_ok=True)
    save_off(os.path.join(root, "train", "sphere.off"), make_icosphere(3))
    save_off(os.path.join(root, "train", "torus.off"), make_torus(48, 24))
    save_off(os.path.join(root, "val", "sphere_v.off"), make_icosphere(3))


def _prebuild_caches(root: str) -> None:
    """Populate the per-shape pickle caches BEFORE the two ranks launch —
    the processes would otherwise race on cache writes (the reference
    handles the same race with filesystem spin-waits,
    offset_dataset.py:408-409; one pre-pass is the single-controller way).
    """
    from deep3dpointclouddenoising_tpu.data.offset_dataset import \
        OffsetDataset
    for split in ("train", "val"):
        OffsetDataset(root, split, num_steps=16, num_epochs=1,
                      in_radius=0.05, num_points=128,
                      noise_type="gaussian", noise_level=0.001,
                      debug=True, seed=0)


def test_two_process_train(tmp_path):
    root = str(tmp_path / "shapes")
    logdir = str(tmp_path / "log")
    _make_shapes(root)
    _prebuild_caches(root)
    port = _free_port()

    procs = []
    out_files = []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        cmd = [
            sys.executable, os.path.join(REPO, "scripts", "train.py"),
            "--config_file", os.path.join(REPO, "cfgs", "debugging.yaml"),
            "--data_root", root, "--platform", "cpu",
            "--log_dir", logdir,
            "--num_points", "128", "--width", "32", "--num_steps", "16",
            "--batch_size", "8", "--epochs", "1",
            "--multihost",
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2", "--process_id", str(pid),
        ]
        # stream rank output to files so a timeout is diagnosable (a PIPE
        # would lose everything when the rank is killed)
        f = open(str(tmp_path / f"rank{pid}.out"), "w+")
        out_files.append(f)
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env, text=True,
            stdout=f, stderr=subprocess.STDOUT))

    outs = []
    deadline = 900
    import time as _time
    t0 = _time.time()
    for pid, p in enumerate(procs):
        try:
            p.wait(timeout=max(10, deadline - (_time.time() - t0)))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            tails = []
            for qid, f in enumerate(out_files):
                f.flush()
                f.seek(0)
                tails.append(f"--- rank {qid} tail ---\n"
                             + f.read()[-3000:])
            pytest.fail("multihost 2-process run timed out\n"
                        + "\n".join(tails))
    for f in out_files:
        f.flush()
        f.seek(0)
        outs.append(f.read())
        f.close()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"rank {pid} failed (rc={p.returncode}):\n{out[-3000:]}"
    # both ranks must have seen the GLOBAL 8-device mesh (4 local x 2 procs)
    assert "devices: 8" in outs[0], outs[0][-2000:]
    assert "devices: 8" in outs[1], outs[1][-2000:]
    # training actually stepped, with finite losses, on both ranks
    for pid, out in enumerate(outs):
        losses = [float(ln.split(" loss ", 1)[1].split()[0])
                  for ln in out.splitlines()
                  if "Train [1/1]" in ln and " loss " in ln]
        assert losses, f"rank {pid} logged no training losses:\n{out[-2000:]}"
        assert np.all(np.isfinite(losses))
    # rank-0-gated checkpoint landed exactly once
    exp_dir = os.path.join(logdir, "over_fitting_to_patch")
    assert os.path.isdir(os.path.join(exp_dir, "current"))
