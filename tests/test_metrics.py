"""SmoothedValue / MetricLogger counters."""

import numpy as np

from recnext_tpu.utils.metrics import MetricLogger, SmoothedValue


def test_smoothed_value_window_and_global():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.value == 4.0
    assert v.median == 3.0  # window = [2, 3, 4]
    np.testing.assert_allclose(v.avg, 3.0)
    np.testing.assert_allclose(v.global_avg, 2.5)
    assert "(" in str(v)


def test_metric_logger_log_every(capsys):
    ml = MetricLogger()
    for i, _ in enumerate(ml.log_every(range(5), print_freq=2, header="t", total=5)):
        ml.update(loss=float(i))
    out = capsys.readouterr().out
    assert "t [0/5]" in out and "done in" in out
    np.testing.assert_allclose(ml.meters["loss"].global_avg, 2.0)
