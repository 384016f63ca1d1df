"""raptor_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the parse-to-triples capabilities of the Raptor RDF syntax
library (reference behavior: dajobe/raptor) as an idiomatic Spark pipeline:

- ``raptor_spark.kernel``   — pure-Python per-document parse/serialize kernel
  (no Spark imports; this is what the vectorized pandas UDFs batch over).
- ``raptor_spark.operators`` — DataFrame-level operators: transcript
  reassembly, parse/explode, canonicalization, dedup, entity linking,
  training-data ops (minhash/simhash dedup, ANN, text quality).
- ``raptor_spark.sources``  — deterministic synthetic transcript generation
  and conformance-fixture embedding.
- ``raptor_spark.plans``    — checkpoint/resume manifests, lineage counters.
"""

__version__ = "0.1.0"
