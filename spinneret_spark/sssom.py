"""SSSOM ingestion/export — distributed equivalent of the reference
entry point ``sssom.from_lter(path_in, path_out)``
(/root/reference/src/spinneret/sssom.py:6-85).

Semantics preserved exactly:
* keep only ``skos:prefLabel`` triples (sssom.py:51-52);
* project to the 12-column 3/5-star SSSOM shape with 10 empty columns
  (sssom.py:53-70);
* write-once TSV ``lter.sssom.tsv`` — never silently overwrite
  (mode="x" contract, sssom.py:33-35,71);
* 7-key YAML metadata stub ``lter.sssom.yml`` next to it
  (sssom.py:72-83).

Architecture differs: parsing is a distributed line scan with regex
extraction (rdflib is a single-process in-memory triple store; at
vocabulary scale a DataFrame scan is both simpler and parallel).
RDF/XML inputs are pre-flattened by :func:`rdfxml_to_ntriples` — a
deliberately small stdlib converter that covers the Description/
prefLabel subset the reference consumes.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from spinneret_spark.sources.vocab import sssom_from_ntriples

_META_KEYS = [
    "mapping_set_id:",
    "license:",
    "mapping_set_version:",
    "mapping_set_description:",
    "object_source:",
    "subject_source:",
    "curie_map:",
]

_SKOS = "http://www.w3.org/2004/02/skos/core#"
_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def rdfxml_to_ntriples(path_in: str, path_out: str) -> None:
    """Flatten RDF/XML Descriptions to N-Triples (prefLabel subset)."""
    tree = ET.parse(path_in)
    with open(path_out, "w", encoding="utf-8") as out:
        for desc in tree.getroot().iter():
            about = desc.get(f"{{{_RDF}}}about")
            if about is None:
                continue
            for child in desc:
                if child.tag == f"{{{_SKOS}}}prefLabel" and child.text:
                    label = child.text.replace("\\", "\\\\").replace('"', '\\"')
                    out.write(
                        f'<{about}> <{_SKOS}prefLabel> "{label}" .\n'
                    )


def from_lter(spark: SparkSession, path_in: str, path_out: str) -> dict:
    """N-Triples (or pre-converted RDF) vocabulary → SSSOM TSV + YAML.

    Returns {"data_path", "meta_path"} exactly like the reference
    (sssom.py:84-85).
    """
    data_path = path_out + "/" + "lter.sssom.tsv"
    meta_path = path_out + "/" + "lter.sssom.yml"
    if os.path.exists(data_path) or os.path.exists(meta_path):
        raise FileExistsError(
            f"SSSOM output already exists under {path_out} "
            "(write-once contract, reference sssom.py:33-35)"
        )
    df = sssom_from_ntriples(spark, path_in)
    _write_single_tsv(df, data_path)
    with open(meta_path, mode="w+", encoding="utf-8") as f:
        f.write("\n".join(_META_KEYS))
    return {"data_path": data_path, "meta_path": meta_path}


def _write_single_tsv(df: DataFrame, path: str) -> None:
    """Small-vocabulary convenience sink: one TSV file at ``path``.

    Spark's csv writer emits a directory; the reference contract wants
    a single file (sssom.py:71), so write to a temp dir and move the
    single part file. Vocabularies are dictionary-sized by definition;
    corpus-scale outputs use the partitioned sinks instead.
    """
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="sssom_tsv_")
    (
        df.coalesce(1)
        .write.option("sep", "\t")
        .option("header", True)
        .option("emptyValue", "")
        .mode("overwrite")
        .csv(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp, ignore_errors=True)
