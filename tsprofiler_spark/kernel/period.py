"""Period-tree rollup.

Faithful re-expression of reference: profiler/period/period.go:66-177.
A mixed-radix odometer over chunk index drives one Counter per tree level;
every chunk, each non-leaf level's full TxMatrix snapshot is average-merged
into the tree node at the current path prefix. Reference quirks preserved:

* the leaf counter level never counts (period.go:116-133 has no
  countPeriodTreeNodeLevel call in the leaf branch);
* level i writes to the depth-(i+1) node because GetNode on a leaf with a
  1-element path returns the child (models/treenode.go:44-56); the root
  node never receives a matrix (profiler.go:153 is commented out);
* the snapshot merge is the lossy int-percent average (txmatrix.Merge) with
  Count++ (not += chunk count) on the node stats (period.go:155-176);
* ResetCounters/ResetStats at period boundaries do NOT reset the counter's
  current-state window — history carries across periods.
"""

from __future__ import annotations

import math

from tsprofiler_spark.kernel.counter import Counter, TSState
from tsprofiler_spark.kernel.stats import go_sqrt, weighted_mean
from tsprofiler_spark.kernel.tree import PeriodTree, new_period_tree
from tsprofiler_spark.kernel.txmatrix import tx_merge


class Period:
    def __init__(self, history: int, states: int, buffer_size: int, period_size: list[int]):
        self.history = history
        self.states = states
        self.buffer_size = buffer_size
        self.period_size = list(period_size)
        k = len(self.period_size)
        self.period_counters = [Counter(history, states, buffer_size) for _ in range(k)]
        self.period_size_counter = [0] * k
        self.tx_tree: PeriodTree = new_period_tree(self.period_size)
        self.tx_tree_position = [0] * k

    def count(self, tsstates: list[TSState]) -> None:
        if len(self.period_size) > 0:
            self._count_node(tsstates, 0)

    def _count_node(self, tsstates: list[TSState], level: int) -> bool:
        if level < len(self.tx_tree_position) - 1:
            # always first count for the current level
            self._count_node_level(tsstates, level)
            step_forward = self._count_node(tsstates, level + 1)
            if step_forward:
                self.tx_tree_position[level] += 1
                if self.tx_tree_position[level] >= self.period_size[level]:
                    self.tx_tree_position[level] = 0
                    return True
                self.period_counters[level].reset_counters()
                self.period_counters[level].reset_stats()
        else:
            # leaf level: odometer only, no counting (reference quirk)
            self.period_size_counter[level] += 1
            if self.period_size_counter[level] >= self.period_size[level]:
                self.period_counters[level].reset_counters()
                self.period_counters[level].reset_stats()
                self.period_size_counter[level] = 0
                return True
        return False

    def _count_node_level(self, tsstates: list[TSState], level: int) -> None:
        counter = self.period_counters[level]
        counter.count_all(tsstates)

        tx = counter.get_tx()
        tree_pos = self.tx_tree_position[: level + 1]
        node = self.tx_tree.get_node(tree_pos)

        txmatrix = node.txmatrix
        if len(txmatrix) != len(tx):
            txmatrix = tx
        else:
            for m in range(len(tx)):
                tx_merge(txmatrix[m], tx[m])
                # stats merge: Count++ (not += chunk count), min/max clamp,
                # weighted avg with the already-incremented count
                st = txmatrix[m]["stats"]
                st.count += 1
                if st.min > tx[m]["stats"].min:
                    st.min = tx[m]["stats"].min
                if st.max < tx[m]["stats"].max:
                    st.max = tx[m]["stats"].max
                st.avg = weighted_mean(
                    [st.avg, tx[m]["stats"].avg],
                    [float(st.count), float(tx[m]["stats"].count)],
                )
                st.stddev_sum += tx[m]["stats"].stddev_sum
                st.stddev = go_sqrt(st.stddev_sum / float(st.count))
        node.txmatrix = txmatrix

    def get_tx(self) -> PeriodTree:
        return self.tx_tree

    def get_current_period_path(self) -> list[int]:
        return list(self.tx_tree_position)
