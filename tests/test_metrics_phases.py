"""Per-phase wall-clock accounting (metrics.phase) — r5 e2e
instrumentation.  Exclusive-time semantics: nested phases charge the
inner name and subtract themselves from the enclosing frame."""

import time

from recgraph_tpu import metrics


def test_phase_exclusive_nesting():
    metrics.reset_phases()
    with metrics.phase("outer"):
        time.sleep(0.05)
        with metrics.phase("inner"):
            time.sleep(0.1)
        time.sleep(0.05)
    d = metrics.phases_dict()
    assert d["inner"] >= 0.1
    assert 0.05 <= d["outer"] < 0.1 + d["inner"]  # inner time excluded
    metrics.reset_phases()
    assert metrics.phases_dict().get("outer") is None


def test_phase_same_name_accumulates():
    metrics.reset_phases()
    for _ in range(3):
        with metrics.phase("p"):
            time.sleep(0.02)
    assert metrics.phases_dict()["p"] >= 0.06
    metrics.reset_phases()


def test_phase_summary_orders_by_cost():
    metrics.reset_phases()
    with metrics.phase("small"):
        time.sleep(0.01)
    with metrics.phase("big"):
        time.sleep(0.05)
    s = metrics.phase_summary()
    assert s.index("big") < s.index("small")
    metrics.reset_phases()
