"""The bench artifact's bounds contract (bench.py:_check_bounds).

The driver records bench.py's JSON lines as the per-round artifact; the
bounds machinery is what turns silent accuracy/efficiency regressions
into a loud ``bounds_failed`` entry (VERDICT r3 next #1c, ADVICE r4).
These tests pin its semantics:

* accuracy keys are UPPER bounds (error ceilings), efficiency keys are
  LOWER bounds (ADVICE r4: multistream_efficiency=0.17 previously passed
  because every non-weak_scaling key was treated as a ceiling);
* environment waivers (`_oversubscribed`, `_degraded`) skip the bound
  but keep the number recorded;
* the loop-efficacy invariants (>=3 loops, corrected <= 1.2x uncorrected).
"""

import importlib.util
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_module"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_accuracy_keys_are_ceilings(bench):
    extras = {"ate_rmse_m": 0.2, "dense_ate_rmse_m": 0.01}
    bench._check_bounds(extras)
    assert extras["bounds_failed"] == [
        f"ate_rmse_m=0.2 vs bound {bench.BOUNDS['ate_rmse_m']}"
    ]


def test_efficiency_keys_are_floors(bench):
    # ADVICE r4: a collapsed batch must land in bounds_failed
    extras = {"multistream_efficiency": 0.17, "weak_scaling_2host": 0.95}
    bench._check_bounds(extras)
    assert any("multistream_efficiency" in f for f in extras["bounds_failed"])
    assert not any("weak_scaling" in f for f in extras["bounds_failed"])
    good = {"multistream_efficiency": 0.45, "weak_scaling_2host": 0.6}
    bench._check_bounds(good)
    assert any("weak_scaling_2host" in f for f in good["bounds_failed"])
    assert not any("multistream" in f for f in good["bounds_failed"])


def test_environment_waivers(bench):
    extras = {
        "weak_scaling_4host": 0.4,
        "weak_scaling_4host_oversubscribed": True,
        "multistream_efficiency": 0.1,
        "multistream_efficiency_degraded": True,
    }
    bench._check_bounds(extras)
    assert extras["bounds_failed"] == []
    # numbers stay recorded alongside the waiver flags
    assert extras["weak_scaling_4host"] == 0.4
    assert extras["multistream_efficiency"] == 0.1


def test_loop_efficacy_invariants(bench):
    few = {"long_loops": bench.MIN_LONG_LOOPS - 1}
    bench._check_bounds(few)
    assert any("long_loops" in f for f in few["bounds_failed"])
    worse = {"long_ate_rmse_m": 0.5, "long_ate_no_loop_m": 0.1}
    bench._check_bounds(worse)
    assert any("worse than uncorrected" in f for f in worse["bounds_failed"])
    fine = {"long_ate_rmse_m": 0.09, "long_ate_no_loop_m": 0.086,
            "long_loops": 29}
    bench._check_bounds(fine)
    assert fine["bounds_failed"] == []


def test_all_bound_keys_have_a_direction(bench):
    """Every BOUNDS key must be an accuracy ceiling (``*_m``) or a known
    efficiency floor — a new key with an ambiguous name would silently
    get ceiling semantics (the ADVICE r4 failure mode)."""
    for key in bench.BOUNDS:
        assert key.endswith("_m") or key.startswith(
            ("weak_scaling", "multistream")
        ), f"ambiguous bound direction for {key}"
