"""datavec_spark — a PySpark-native analytics / CDC-ingest engine.

A from-scratch reimplementation of the *semantics* of huitseeker/DataVec
(record transform pipelines, schema management, analysis/quality, joins,
reductions, sequence ops) on idiomatic PySpark DataFrame/SQL + Structured
Streaming, grafted onto a CDC/incremental-ingest north rule: tail a
binlog/WAL-style change stream over a lake table of source-code repos
(repo, path, commit, lang, content) and apply key-partitioned MERGE
upserts with last-writer-wins sequence resolution, watermarked dedup and
exactly-once epoch-fenced commits.

Layout:
  sources/icelite.py   transactional snapshot table format (Iceberg-semantics
                       stand-in: atomic commits, schema evolution by field id,
                       bucket COW merge, snapshot summary fencing, time travel)
  streaming/           CDC replay drivers (batch + Structured Streaming)
  operators/           DataVec operator parity (transform chain, reducers,
                       joins, sequence/window ops) as declarative specs
                       compiled to native Column expressions
  functions/           analysis/quality, text, dedup, similarity, multimodal
  plans/               schema registry + pipeline (de)serialization
"""

__version__ = "0.1.0"
