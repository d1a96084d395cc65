"""Period tree model.

Faithful re-expression of reference: models/tree.go and models/treenode.go,
including the navigation quirk pinned by models/tree_test.go:156-166: extra
path elements on a leaf return the leaf itself. Node UUIDs are deterministic
(preorder position within the tree) instead of ``rand.Intn(999)`` — UUIDs
carry no semantics, but must be reproducible across processes so profile
JSON compares bit-exactly between driver and executor runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PeriodTreeNode:
    uuid: int = 0
    max_childs: int = 0
    max_counts: int = 0
    children: list["PeriodTreeNode"] = field(default_factory=list)
    txmatrix: list[dict] = field(default_factory=list)

    def get_node(self, path: list[int]) -> "PeriodTreeNode":
        """Path navigation (models/treenode.go:44-56)."""
        if len(path) == 0:
            return self
        if len(path) > 1:
            return self.children[path[0]].get_node(path[1:])
        if len(self.children) > 0:
            return self.children[path[0]]
        return self

    def to_json_dict(self) -> dict:
        return {
            "UUID": self.uuid,
            "maxChilds": self.max_childs,
            "maxCounts": self.max_counts,
            "children": [c.to_json_dict() for c in self.children],
            "txmatrix": [
                {
                    "metric": t["metric"],
                    "transitions": t["transitions"],
                    # profiler-built trees carry TSStats objects;
                    # from_json_dict-parsed trees carry plain dicts (the
                    # Predictor reads them as dicts) — serialize both, so
                    # parse -> re-serialize round-trips
                    "stats": (
                        t["stats"].to_json_dict()
                        if hasattr(t["stats"], "to_json_dict")
                        else t["stats"]
                    ),
                }
                for t in self.txmatrix
            ],
        }

    @staticmethod
    def from_json_dict(d: dict) -> "PeriodTreeNode":
        return PeriodTreeNode(
            uuid=d.get("UUID", 0),
            max_childs=d.get("maxChilds", 0),
            max_counts=d.get("maxCounts", 0),
            children=[PeriodTreeNode.from_json_dict(c) for c in d.get("children", [])],
            txmatrix=d.get("txmatrix", []) or [],
        )


def new_period_tree_node(size: list[int], _counter: list[int] | None = None) -> PeriodTreeNode:
    """Recursive constructor (models/treenode.go:8-41); preorder uuids."""
    if _counter is None:
        _counter = [0]
    _counter[0] += 1
    uuid = _counter[0]
    max_childs = 0
    max_counts = 0
    children: list[PeriodTreeNode] = []
    if len(size) > 0:
        if len(size) > 1:
            max_childs = size[0]
            for _ in range(max_childs):
                child = new_period_tree_node(size[1:], _counter)
                max_counts += child.max_counts
                children.append(child)
        else:
            max_counts = size[0]
    return PeriodTreeNode(
        uuid=uuid,
        max_childs=max_childs,
        max_counts=max_counts,
        children=children,
        txmatrix=[],
    )


@dataclass
class PeriodTree:
    root: PeriodTreeNode

    def get_node(self, path: list[int]) -> PeriodTreeNode:
        return self.root.get_node(path)

    def to_json_dict(self) -> dict:
        return {"root": self.root.to_json_dict()}

    @staticmethod
    def from_json_dict(d: dict) -> "PeriodTree":
        return PeriodTree(root=PeriodTreeNode.from_json_dict(d["root"]))


def new_period_tree(size: list[int]) -> PeriodTree:
    return PeriodTree(root=new_period_tree_node(list(size)))
