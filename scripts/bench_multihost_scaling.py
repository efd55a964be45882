"""Weak-scaling of the MULTI-PROCESS (emulated multi-host) pose-graph solve.

Unlike scripts/bench_scaling.py (single process, virtual device mesh), each
"host" here is a real OS process with its own XLA runtime, federated via
jax.distributed (gRPC rendezvous) and gloo CPU collectives — the same
control plane a multi-host TPU pod uses. The problem grows with the host
count (fixed keyframes per device), so efficiency = t(1 host)/t(N hosts).

Loopback gloo is not ICI, so this validates the communication *structure*
(one [K,6] all-gather + one psum_scatter per PCG matvec, wire volume
independent of factor count) and the end-to-end multi-process runtime, not
interconnect bandwidth.

    python scripts/bench_multihost_scaling.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from launch_multihost import launch  # noqa: E402


def main() -> int:
    # one device per emulated host, and never more hosts than physical
    # cores — oversubscribed emulation measures the OS scheduler, not the
    # solver's communication structure
    nodes_per_device = int(os.environ.get("MH_NODES_PER_DEV", "8192"))
    max_hosts = min(int(os.environ.get("MH_MAX_HOSTS", "4")), os.cpu_count())
    # communication-avoiding inner-outer PCG: 24 local inner iterations per
    # outer step -> 6 outer steps carry all the collectives (vs 48 for
    # the plain block-Jacobi PCG, at equal solution quality: err_vs_gt
    # 8e-4 vs 0.24 init on the demo circle, parity 5 mm vs single-device)
    inner = int(os.environ.get("MH_INNER_ITERS", "24"))
    outer = int(os.environ.get("MH_OUTER_ITERS", "6" if inner else "48"))
    hosts = [n for n in (1, 2, 4) if n <= max_hosts]
    results = {}
    for n in hosts:
        res = launch(
            num_processes=n,
            local_devices=1,
            nodes_per_device=nodes_per_device,
            pcg_iters=outer,
            gn_iters=4,
            inner_iters=inner,
            repeats=3,
        )
        results[n] = res
        print(f"hosts={n}: {json.dumps(res)}", flush=True)
    t1 = results[1]["solve_s"]
    top = hosts[-1]
    out = {
        "metric": "multihost_weak_scaling_efficiency",
        "value": round(t1 / results[top]["solve_s"], 3),
        "unit": f"t(1 host)/t({top} hosts)",
        "nodes_per_device": nodes_per_device,
        "devices_per_host": 1,
        "inner_iters": inner,
        "hosts": hosts,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
