"""Multi-PROCESS execution tier (VERDICT r3 next-round #4).

Launches `scripts/multiprocess_sim.py` as 2 real OS processes × 4 CPU
devices each, bootstrapped with `jax.distributed.initialize` (coordinator
on localhost) — the genuine analogue of the reference's multi-process DDP
(train.py:260) and torch.distributed bootstrap (eval/distributed.py:13-27)
— plus a 1-process × 8-device reference run, and asserts:

  * both runs compute the SAME loss / grad-norm / update-norm for one
    SD1.5 train step on the same 4×2 (data, fsdp) mesh;
  * the host-sharded BatchLoader's per-process partitions are disjoint and
    complete across the two processes (checked inside the sim via a cross-
    process allgather);
  * a sharded orbax save issued from BOTH processes restores to the saved
    values.

Slow tier (-m slow): two fresh JAX processes + a distributed handshake.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIM = os.path.join(REPO, "scripts", "multiprocess_sim.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(n_devices, extra, timeout=600):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env.pop("JAX_PLATFORMS", None)  # the sim forces cpu itself
    return subprocess.Popen(
        [sys.executable, SIM] + extra,
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    out2 = tmp_path / "mp2.json"
    out1 = tmp_path / "mp1.json"

    procs = [
        _run(4, ["--num-processes", "2", "--process-id", str(pid),
                 "--coordinator", f"localhost:{port}",
                 "--ckpt-dir", str(tmp_path / "ckpt2")]
                + (["--out", str(out2)] if pid == 0 else []))
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout)
    # exit 75 = the sim's own diagnosis of a cross-process TRANSPORT failure
    # (Gloo pair connect / coordination deadline) — an environment limit,
    # not a numerics bug; skip with the diagnosis instead of failing.
    if any(p.returncode == 75 for p in procs):
        diag = "\n".join(
            ln for log in logs for ln in log.splitlines()
            if "TRANSPORT_FAILURE" in ln)
        pytest.skip(
            "cross-process transport unavailable in this environment "
            f"(sim exit 75):\n{diag}")
    assert all(p.returncode == 0 for p in procs), (
        "sim process failed (non-transport — investigate as a code bug):\n"
        + "\n----\n".join(logs))

    ref = _run(8, ["--num-processes", "1", "--ckpt-dir", str(tmp_path / "ckpt1"),
                   "--out", str(out1)])
    stdout, _ = ref.communicate(timeout=600)
    assert ref.returncode == 0, stdout

    r2 = json.loads(out2.read_text())
    r1 = json.loads(out1.read_text())
    assert r2["devices"] == r1["devices"] == 8
    assert r2["loss"] == pytest.approx(r1["loss"], rel=2e-5)
    assert r2["grad_norm"] == pytest.approx(r1["grad_norm"], rel=1e-4)
    assert r2["update_norm"] == pytest.approx(r1["update_norm"], rel=5e-3)
    assert r1["update_norm"] > 0  # non-trivial update (warmup lr is tiny, not 0)
    # loader partition (allgather-checked inside the 2-proc run) + sharded
    # orbax roundtrip must have passed in BOTH topologies
    assert r2["loader_ok"] and r1["loader_ok"]
    assert r2["ckpt_ok"] and r1["ckpt_ok"]
    # the 2-process run really was 2 processes × 4 devices
    assert "4 local / 8 global devices" in logs[0] + logs[1]
