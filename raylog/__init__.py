"""raylog — a Ray-Data-native log/telemetry processing engine.

A from-scratch reimplementation (NOT a port) of the query/data-processing
capabilities of `erenming/erda-fluent-bit` (reference snapshot at
/root/reference), re-expressed idiomatically on Ray Data:

- vectorized grok/regex parsing as ``map_batches`` over zero-copy Arrow
  batches (reference: the fluent-bit ``parser`` filter chain,
  conf/ds/parsers.conf);
- stateful enrichment (k8s-metadata / cpuset / record_modifier analogs,
  conf/ds/fluent-bit.conf:44-59, conf/eci/fluent-bit.conf:55-99) as
  broadcast-lookup actor-pool map stages;
- tag routing (rewrite_tag, conf/ds/fluent-bit.conf:181-193) as filter
  fan-out to per-sink Parquet writers;
- per-sink groupby-aggregate counts with partial (per-batch) aggregation
  so the only shuffle moves tiny partials, never rows.

The engine's primary input contract is a Parquet table of pre-tokenized
log records: ``(doc_id, tokens: list<int32>, n_tok: int32, source: string,
raw: string)``; the per-row invariant is exact token-array equality
between input rows and routed output rows.
"""

__version__ = "0.1.0"
