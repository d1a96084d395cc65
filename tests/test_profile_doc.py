"""Full-profile-document oracle (entry_queries_pipeline._profile_doc_oracle):
the DuckDB replay must rebuild the byte-identical ``json.dumps(doc,
sort_keys=True)`` string the kernel emits — assembly glue included (key
ordering, separators, repr double formatting, settings block, empty-section
shapes). Pure DuckDB + kernel tests, no Spark session needed."""

import json
import math

import duckdb
import numpy as np
import pytest

from tsprofiler_spark.plans import entry_queries_pipeline as EQ
from tsprofiler_spark.plans.parity import _fold_series
from tsprofiler_spark.sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL


def _kernel_docs(con):
    """Ground truth: fold every series through ReferenceProfiler and dump
    the document exactly like plans/parity.parity_profiles does."""
    t = con.sql(TRANSCRIPTS_FROM_EVENTS_SQL).df()
    t["metric"] = "len_text"
    t["value"] = t["text"].str.len().astype(float)
    settings = EQ._parity_settings()
    docs = {}
    for key, g in t.groupby(["conv_id", "tool", "role"]):
        pdf = g[["conv_id", "tool", "role", "turn_idx", "ts", "metric", "value"]].copy()
        prof = _fold_series(pdf, settings)
        docs[key] = json.dumps(prof.get_profile(), sort_keys=True)
    return docs


def _oracle_docs(con):
    return {
        (r[0], r[1], r[2]): r[3]
        for r in con.sql(EQ._profile_doc_oracle()).fetchall()
    }


def test_doc_oracle_matches_kernel_on_sf0001():
    """Whole-corpus byte equality at sf0.001 (223 series: chunk-less docs,
    single- and multi-chunk tree nodes, every assembly branch)."""
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = _kernel_docs(con)
    got = _oracle_docs(con)
    assert len(got) == len(want) > 0
    mism = [k for k in want if got.get(k) != want[k]]
    assert not mism, (len(mism), mism[:3])
    # the corpus must cover the shapes the assembly branches on
    assert any('"roottx": []' in d for d in want.values())  # chunk-less
    assert any('"txmatrix": [{' in d for d in want.values())  # touched node
    assert any('"txmatrix": []}' in d for d in want.values())  # empty node


def test_doc_oracle_matches_kernel_multi_phase():
    """Multi-phase documents (n_phases >= 2): never-counted phases
    serialize as [], phasetx grows and string-sorts its idents, the phase
    list order is creation order — none of which the sf0.001 corpus
    exercises (its series are too short to split phases)."""
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE events(user_id BIGINT, event_type VARCHAR, "
        "props VARCHAR, value DOUBLE, ts TIMESTAMP, event_id BIGINT)"
    )
    rows = []
    rng = np.random.default_rng(11)
    eid = 0
    for conv in range(6):
        n = 120
        for i in range(n):
            # two hard regimes (short texts then long texts) with noise:
            # the likeliness window collapses at the boundary and the
            # fold creates (and sometimes jumps back to) phases
            if (i // 40) % 2 == 0:
                v = float(rng.integers(2, 10))
            else:
                v = float(rng.integers(80, 95))
            rows.append((conv, "e", "p", v, eid))
            eid += 1
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?, "
        "TIMESTAMP '2025-01-01' + INTERVAL (?) SECOND, ?)",
        [(u, e, p, v, i * 60, i) for (u, e, p, v, i) in rows],
    )
    want = _kernel_docs(con)
    got = _oracle_docs(con)
    assert len(got) == len(want) > 0
    mism = [k for k in want if got.get(k) != want[k]]
    assert not mism, (len(mism), mism[:3])
    # the synthetic corpus must actually split phases, or this proves
    # nothing beyond the sf0.001 test
    multi = [d for d in want.values() if '"phases": [[' in d and d.count('"phases": [') >= 1
             and json.loads(d)["phases"]["tx"] is not None
             and len(json.loads(d)["phases"]["phases"]) >= 2]
    assert len(multi) >= 3, len(multi)
    # and at least one doc carries a never-counted phase (serialized [])
    assert any(
        any(len(p) == 0 for p in json.loads(d)["phases"]["phases"])
        for d in multi
    )


def test_duckdb_double_format_matches_python_repr():
    """The byte-equality of the document hinges on DuckDB's DOUBLE->VARCHAR
    cast producing Python repr (shortest round-trip decimal). Sweep random
    doubles across the document's value domain plus adversarial classes;
    if a DuckDB upgrade ever changes formatting, THIS fails (not the
    driver gate)."""
    con = duckdb.connect()
    rng = np.random.default_rng(3)
    vals = []
    # document domain: averages/stddevs/cross-term sums of text lengths
    vals += list(rng.uniform(0, 128, 5000))
    vals += list(rng.uniform(-1e7, 1e7, 5000))
    # integral doubles ("5.0"), halves, small fractions
    vals += [float(x) for x in rng.integers(-1000, 1000, 2000)]
    vals += list(rng.integers(-1000, 1000, 2000) / 2.0)
    vals += list(rng.uniform(0, 1, 3000))
    # exact decimal-looking values and negative zero
    vals += [0.0, -0.0, 0.5, 128.0, 57.49999999999999, 1e15 - 1.0]
    # random bit patterns (finite only): exercises subnormals + extremes
    bits = rng.integers(0, 2**63, 3000, dtype=np.uint64)
    for b in bits:
        f = float(np.uint64(b).view(np.float64))
        if math.isfinite(f):
            vals.append(f)
    got = con.execute(
        "SELECT CAST(CAST(x AS DOUBLE) AS VARCHAR) FROM "
        "(SELECT unnest(?) AS x)",
        [[float(v) for v in vals]],
    ).fetchall()
    bad = [
        (v, repr(float(v)), g[0])
        for v, g in zip(vals, got)
        if g[0] != repr(float(v))
    ]
    assert not bad, (len(bad), bad[:10])


def test_doc_oracle_registered_for_driver():
    """parity_profiles is a DRIVER row with a full oracle (r4 verdict ask
    #3: retired from _DRIVER_EXCLUDED), and parity_roottx — its strict
    projection — took the vacated excluded slot."""
    import __spark_entry__ as entry

    assert "parity_profiles" in entry._DRIVER_ORDER
    assert "parity_profiles" not in entry._DRIVER_EXCLUDED
    assert "parity_roottx" in entry._DRIVER_EXCLUDED
    assert len(entry._DRIVER_ORDER) == 50
    assert "parity_profiles" in entry.oracle_sql()
