"""hamerkop_ray — a Ray-Data-native record-linkage / data-processing engine.

A from-scratch reimplementation of the query & data-processing capabilities of
iscoe/hamerkop (reference at /root/reference, Apache-2.0) re-expressed as Ray
Data pipelines: blocking -> pairwise scoring -> transitive clustering over
Arrow tables of interleaved text+media documents.

Layout:
  schemas      declared pyarrow schemas for every logical table
  ids          deterministic, content-derived identifiers (parallel-safe)
  functions/   scalar/vector kernels (strings, phonetics, minhash, edit dist,
               language id, text stats)
  sources/     readers & writers (CoNLL, LoReHLT KB tabs, submission format)
  stages/      pipeline stages (parse, preprocess, coref, blocking, scoring,
               clustering) — each a batch transform over a ray.data.Dataset
  pipelines/   end-to-end flows (flagship ER, dedup, ANN, text analysis)
  state/       checkpoint manifests, lineage, metrics

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned by
the caller (tests, bench.py, the driver).
"""

__version__ = "0.1.0"
