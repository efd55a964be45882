"""GC quiescing for the streaming hot loop (utils/gc_control.py).

A gen-2 CPython collection is a ~400 ms stop-the-world pause with JAX's
object graph resident; the resident pipeline freezes the long-lived
population after warmup so it never lands mid-stream."""

import gc

from liorf_tpu.utils import gc_control


def test_quiesce_freezes_and_quiets_gen2():
    before = gc.get_threshold()
    try:
        gc_control.quiesce()
        t0, t1, t2 = gc.get_threshold()
        assert t2 >= gc_control._GEN2_QUIET_THRESHOLD
        assert gc.get_freeze_count() > 0
        # idempotent
        gc_control.quiesce()
        assert gc.get_threshold()[2] >= gc_control._GEN2_QUIET_THRESHOLD
    finally:
        gc_control.restore()
    assert gc.get_threshold() == before
    assert gc.get_freeze_count() == 0


def test_restore_without_quiesce_is_noop():
    before = gc.get_threshold()
    gc_control.restore()
    assert gc.get_threshold() == before


def test_quiesce_respects_disabled_gc():
    gc.disable()
    try:
        before = gc.get_threshold()
        gc_control.quiesce()
        assert gc.get_threshold() == before  # untouched: caller owns GC
    finally:
        gc.enable()
        gc_control.restore()


def test_pipeline_arms_quiesce_schedule():
    from liorf_tpu.pipeline import SlamConfig
    from liorf_tpu.pipeline.resident import ResidentPipeline

    cfg = SlamConfig(
        scan_capacity=256, map_capacity=1024, kf_cloud_capacity=128,
        imu_window=16,
    )
    pipe = ResidentPipeline(cfg)
    assert pipe._gc_quiesce_at == 8
    cfg2 = SlamConfig(
        scan_capacity=256, map_capacity=1024, kf_cloud_capacity=128,
        imu_window=16, gc_low_latency=False,
    )
    pipe2 = ResidentPipeline(cfg2)
    assert pipe2._gc_quiesce_at == -1
