"""Counter-matrix dimension rescale for dynamic bounds.

Faithful re-expression of reference: utils/txdimension.go:13-88, including
the lazily-computed ident remap whose known wrong double-rescale behavior is
pinned by the reference's own tests (utils/txdimension_test.go:44-48,
"THIS IS WRONG! see issue #5") — parity means reproducing it.
"""

from __future__ import annotations

from tsprofiler_spark.kernel.discretize import closest_discretize
from tsprofiler_spark.kernel.stats import TSStats


def change_dimension(
    source_matrix: dict[str, list[int]],
    old_stats: TSStats,
    new_stats: TSStats,
    states: int,
) -> dict[str, list[int]]:
    """Remap every counter cell from the old grid to the new grid.

    Cells move additively via ``closest_discretize(i*old_step + old_min)``
    on the new bounds; new bounds are clamped to enclose the old ones.
    """
    target: dict[str, list[int]] = {}

    old_min, old_max = old_stats.min, old_stats.max
    old_step = float(old_max - old_min) / float(states)

    new_min, new_max = new_stats.min, new_stats.max
    if new_min > old_min:
        new_min = old_min
    if new_max < old_max:
        new_max = old_max

    for key in source_matrix:
        new_key: str = ""
        for j in range(len(source_matrix[key])):
            old_counter = source_matrix[key][j]
            if old_counter <= 0:
                continue

            if new_key == "":
                # lazy compute: remapped ident not yet calculated
                parts = key.split("-")
                for part in parts:
                    try:
                        i = int(part)
                    except ValueError:
                        i = 0
                    value_i = float(i) * old_step + old_min
                    new_state_i = closest_discretize(value_i, states, new_min, new_max)
                    if new_state_i < 0 or new_state_i >= states:
                        new_key = ""
                        break
                    if new_key != "":
                        new_key += "-"
                    new_key += str(new_state_i)
            if new_key == "":
                continue

            value_j = float(j) * old_step + old_min
            new_state_j = closest_discretize(value_j, states, new_min, new_max)
            if new_state_j < 0 or new_state_j >= states:
                continue

            if new_key not in target:
                target[new_key] = [0] * states
            target[new_key][new_state_j] += old_counter

    return target
