"""Multi-host (multi-process jax.distributed) pose-graph solve.

Spawns real worker processes federated through a gRPC coordinator and gloo
CPU collectives — the same code path an N-host TPU pod uses (SURVEY §5.8;
the reference is single-machine-only). Verifies the collective solve runs
to completion and matches the single-device solver bit-for-nearly-bit.
"""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

from launch_multihost import launch  # noqa: E402


def test_two_process_solve_parity():
    # launch() enforces its own 420 s subprocess timeout
    res = launch(
        num_processes=2,
        local_devices=2,
        nodes_per_device=32,
        pcg_iters=32,
        gn_iters=3,
        repeats=1,
    )
    assert res["num_processes"] == 2
    assert res["global_devices"] == 4
    # collective solve agrees with the local single-device solver
    assert res["parity_max_abs_m"] < 1e-3
    # and it actually optimizes
    assert res["err_vs_gt_m"] < 0.5 * res["init_err_m"]


def test_four_process_solve_parity():
    """N=4 emulated hosts — above the 2-host minimum (VERDICT r3 next #7).

    One local device per process keeps the total collective size at 4 while
    exercising a deeper host topology (4 gloo peers instead of 2)."""
    res = launch(
        num_processes=4,
        local_devices=1,
        nodes_per_device=32,
        pcg_iters=32,
        gn_iters=3,
        repeats=1,
    )
    assert res["num_processes"] == 4
    assert res["global_devices"] == 4
    assert res["parity_max_abs_m"] < 1e-3
    assert res["err_vs_gt_m"] < 0.5 * res["init_err_m"]
