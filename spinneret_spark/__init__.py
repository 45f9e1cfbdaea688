"""spinneret_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query and data-processing capabilities of
the reference ``clnsmth/spinneret`` (see /root/reference), re-designed
for Common-Crawl-scale web corpora.

Architecture (SURVEY.md §7): declarative DataFrame plans end-to-end;
Arrow-vectorized pandas UDFs only where built-ins cannot express the
semantics (XML/HTML extraction, dictionary-trie mention scan); no
row-at-a-time Python UDFs anywhere.

Subpackages
-----------
extract    pure-Python deterministic extractors (EML workbook rows,
           HTML→text) invoked from inside Arrow batches
sources    corpus/vocabulary loaders and the deterministic synthetic
           corpus generator
operators  Spark operators: workbook, mention detection, entity
           linking, dedup family, similarity search, connected
           components, text analysis
functions  portable column-expression helpers (hashing, text, vectors)
sinks      partitioned table writes, manifest/lineage, resume
plans      explain/conf audit helpers
streaming  optional foreachBatch incremental skin
"""

__version__ = "0.1.0"
