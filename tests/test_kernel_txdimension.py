"""ChangeDimension parity fixtures ported 1:1 from
/root/reference/utils/txdimension_test.go:10-99, including the pinned-wrong
issue-#5 double-rescale case (:44-48) — parity means reproducing the bug."""

from tsprofiler_spark.kernel.stats import TSStats
from tsprofiler_spark.kernel.txdimension import change_dimension


def test_single_rescale():
    assert change_dimension(
        {"3": [0, 0, 0, 145]},
        TSStats(min=50, max=55),
        TSStats(min=0, max=100),
        4,
    ) == {"2": [0, 0, 145, 0]}


def test_double_rescale_reproduces_issue_5():
    intermediate = change_dimension(
        {"3": [0, 0, 0, 145]},
        TSStats(min=50, max=55),
        TSStats(min=40, max=90),
        4,
    )
    result = change_dimension(
        intermediate,
        TSStats(min=40, max=90),
        TSStats(min=0, max=100),
        4,
    )
    # "2": [0,0,145,0] would be RIGHT; the reference pins the wrong result
    # (see tsprofiler issue #5) and so do we.
    assert result == {"3": [0, 0, 0, 145]}


def test_collapsing_rescale():
    assert change_dimension(
        {"0": [10, 0, 0, 0], "3": [0, 0, 0, 100]},
        TSStats(min=0, max=10),
        TSStats(min=0, max=100),
        4,
    ) == {"0": [110, 0, 0, 0]}


def test_expanding_rescale():
    assert change_dimension(
        {"0": [10, 0, 0, 0], "3": [0, 0, 0, 100]},
        TSStats(min=10, max=20),
        TSStats(min=0, max=20),
        4,
    ) == {"2": [0, 0, 10, 0], "3": [0, 0, 0, 100]}


def test_merging_rescale():
    assert change_dimension(
        {"1": [0, 30, 20, 0], "2": [0, 0, 20, 0], "3": [0, 0, 0, 100]},
        TSStats(min=20, max=50),
        TSStats(min=0, max=100),
        4,
    ) == {"1": [0, 70, 0, 0], "2": [0, 0, 100, 0]}
