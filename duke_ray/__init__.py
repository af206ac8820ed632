"""duke_ray — a Ray-Data-native data-processing / KG-construction engine.

A from-scratch rebuild of the query and data-processing capabilities of
uncharted-distil/duke (reference: /root/reference/Duke, "Tabular Dataset
Summarization System"), re-expressed as streaming ``ray.data.Dataset``
pipelines over zero-copy Arrow batches, extended into a knowledge-graph
construction engine (mention detection, triple extraction, canonicalization,
entity linking, graph materialization) plus the operator set a large-scale
training-data pipeline needs (dedup, similarity search, text analysis).

Design stance (see SURVEY.md):
- every stage is ``Dataset -> Dataset`` over ``batch_format='pyarrow'``;
- stateful stages (embedding matrices, gazetteers, entity indexes) are
  actor pools with state pinned in ``__init__``;
- small side-assets are broadcast once via ``ray.put``;
- wide steps (canonicalization, dedup) are salted two-stage group-bys;
- nothing materializes the corpus on the driver.
"""

__version__ = "0.1.0"
