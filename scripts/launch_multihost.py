"""Launch an emulated N-host run of the distributed pose-graph solver.

Spawns N local worker processes (one per emulated host, each with its own
CPU device set federated through jax.distributed + gloo) and runs the
keyframe-sharded GN/PCG solve collectively — the same code path a real
N-host TPU pod deployment uses, minus the ICI (see
liorf_tpu/dist/multihost.py).

    python scripts/launch_multihost.py --num-processes 2 \
        --local-devices 2 --nodes-per-device 64

Prints the worker-0 JSON result line.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(
    num_processes: int,
    local_devices: int = 2,
    nodes_per_device: int = 64,
    pcg_iters: int = 48,
    gn_iters: int = 4,
    inner_iters: int = 0,
    repeats: int = 3,
    timeout: float = 420.0,
) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = free_port()
    env = dict(os.environ)
    # scrub single-process test/device forcing; workers set their own counts
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORM_NAME"] = "cpu"

    import shutil
    import tempfile

    # Pin every worker to ONE core (when taskset exists): XLA:CPU threads
    # across all available cores per process, so an unpinned 1-process
    # baseline uses every core while N processes fight over them — the
    # measured "weak scaling" is then core contention, not collective
    # overhead. One core per worker makes t(1 host) vs t(N hosts)
    # like-for-like on any host with >= N cores.
    cores = os.cpu_count() or 1
    pin = shutil.which("taskset") is not None

    procs = []
    files = []
    for pid in range(num_processes):
        cmd = (["taskset", "-c", str(pid % cores)] if pin else []) + [
            sys.executable, "-m", "liorf_tpu.dist.multihost",
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", str(num_processes),
            "--process-id", str(pid),
            "--platform", "cpu",
            "--local-devices", str(local_devices),
            "--nodes-per-device", str(nodes_per_device),
            "--pcg-iters", str(pcg_iters),
            "--gn-iters", str(gn_iters),
            "--inner-iters", str(inner_iters),
            "--repeats", str(repeats),
        ]
        # temp files, not PIPEs: a worker blocked on a full pipe while its
        # peers sit in a collective deadlocks the whole launch
        fo = tempfile.TemporaryFile(mode="w+", encoding="utf-8")
        fe = tempfile.TemporaryFile(mode="w+", encoding="utf-8")
        files.append((fo, fe))
        procs.append(subprocess.Popen(cmd, cwd=repo, env=env, stdout=fo, stderr=fe))
    outs = []
    try:
        for p, (fo, fe) in zip(procs, files):
            try:
                rc = p.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    if q.poll() is None:
                        q.kill()
                raise
            fo.seek(0)
            fe.seek(0)
            outs.append((rc, fo.read(), fe.read()))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for fo, fe in files:
            fo.close()
            fe.close()
    for rc, out, err in outs:
        if rc != 0:
            raise RuntimeError(f"worker failed (rc={rc}):\n{err[-4000:]}")
    import json

    line = [l for l in outs[0][1].splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--nodes-per-device", type=int, default=64)
    ap.add_argument("--pcg-iters", type=int, default=48)
    ap.add_argument("--gn-iters", type=int, default=4)
    ap.add_argument("--inner-iters", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    import json

    res = launch(
        args.num_processes, args.local_devices, args.nodes_per_device,
        args.pcg_iters, args.gn_iters, args.inner_iters, args.repeats,
    )
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
