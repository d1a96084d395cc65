"""tsprofiler_spark — a PySpark-native time-series rollup/retention engine.

From-scratch re-expression of the computational semantics of
cha87de/tsprofiler (reference at /root/reference, GPL Go code — NOT ported;
re-implemented Spark-first) over tables of multi-turn conversation
transcripts (conv_id, turn_idx, role, text, tool, ts).

Layout
------
kernel/     pure-numpy oracle kernels replicating the reference bit-exactly
            (discretizers, Markov counters, period tree, phases, predictor)
codec/      Gorilla XOR + delta-of-delta bit packers (numpy, vectorized)
functions/  Spark Column expression helpers (go_round, discretize, idents)
sources/    transcript synthesis + table loaders
operators/  DataFrame operators (gap-fill, bucketize, stats, transitions,
            rollups, dedup, similarity, text analysis, multimodal plumbing)
plans/      end-to-end jobs: profile pipeline, retention tiers, checkpoints
streaming/  Structured Streaming variant of the ingest path
"""

__version__ = "0.1.0"
