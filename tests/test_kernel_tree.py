"""Period-tree navigation parity fixtures ported 1:1 from
/root/reference/models/tree_test.go:10-168 (incl. leaf-overrun quirk)."""

from tsprofiler_spark.kernel.tree import PeriodTree, new_period_tree


def _fixture_tree():
    def leaf(uuid):
        return {"UUID": uuid, "maxChilds": 4, "maxCounts": 4, "children": [], "txmatrix": []}

    return PeriodTree.from_json_dict(
        {
            "root": {
                "UUID": 840,
                "maxChilds": 2,
                "maxCounts": 32,
                "children": [
                    {
                        "UUID": 630,
                        "maxChilds": 4,
                        "maxCounts": 16,
                        "children": [leaf(878), leaf(636), leaf(407), leaf(983)],
                        "txmatrix": [],
                    },
                    {
                        "UUID": 203,
                        "maxChilds": 4,
                        "maxCounts": 16,
                        "children": [leaf(506), leaf(20), leaf(914), leaf(272)],
                        "txmatrix": [],
                    },
                ],
                "txmatrix": [],
            }
        }
    )


def test_get_node_paths():
    tree = _fixture_tree()
    assert tree.get_node([]).uuid == 840
    assert tree.get_node([0]).uuid == 630
    assert tree.get_node([1]).uuid == 203
    assert tree.get_node([0, 0]).uuid == 878
    assert tree.get_node([0, 1]).uuid == 636
    assert tree.get_node([0, 2]).uuid == 407
    assert tree.get_node([0, 3]).uuid == 983
    assert tree.get_node([1, 0]).uuid == 506
    assert tree.get_node([1, 1]).uuid == 20
    assert tree.get_node([1, 2]).uuid == 914
    assert tree.get_node([1, 3]).uuid == 272


def test_leaf_overrun_returns_leaf():
    # models/tree_test.go:156-166: extra path elements on a leaf return the leaf
    tree = _fixture_tree()
    assert tree.get_node([0, 0, 0]).uuid == 878


def test_new_period_tree_shape():
    tree = new_period_tree([2, 4])
    assert tree.root.max_childs == 2
    assert len(tree.root.children) == 2
    assert tree.root.max_counts == 8
    assert tree.root.children[0].max_counts == 4
    assert tree.root.children[0].children == []


def test_parsed_tree_reserializes():
    """from_json_dict leaves txmatrix stats as plain dicts (the Predictor
    reads them as dicts); to_json_dict must serialize BOTH profiler-built
    trees (TSStats objects) and parsed trees — parse -> re-serialize is a
    fixed point."""
    from tsprofiler_spark.kernel.tree import PeriodTree

    doc = {
        "root": {
            "UUID": 1,
            "maxChilds": 0,
            "maxCounts": 4,
            "children": [],
            "txmatrix": [
                {
                    "metric": "len_text",
                    "transitions": {"0": {"nextProbs": [100, 0], "probability": 50}},
                    "stats": {"min": 0.0, "max": 9.0, "stddev": 1.0,
                              "avg": 4.0, "count": 4, "stddevsum": 3.0},
                }
            ],
        }
    }
    parsed = PeriodTree.from_json_dict(doc)
    assert parsed.to_json_dict() == doc
