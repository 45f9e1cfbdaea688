"""SSSOM ingestion parity with the reference entry point
(/root/reference/src/spinneret/sssom.py:6-85): prefLabel filter,
12-column shape, write-once TSV, 7-key YAML stub."""

from __future__ import annotations

import pytest

from spinneret_spark.sssom import from_lter, rdfxml_to_ntriples
from spinneret_spark.sources.vocab import SSSOM_COLUMNS, sssom_from_ntriples

NT = """\
<http://vocab.example.org/term/1> <http://www.w3.org/2004/02/skos/core#prefLabel> "aquatic ecosystems" .
<http://vocab.example.org/term/1> <http://www.w3.org/2004/02/skos/core#altLabel> "water systems" .
<http://vocab.example.org/term/2> <http://www.w3.org/2004/02/skos/core#prefLabel> "kelp forest" .
<http://vocab.example.org/term/3> <http://purl.org/dc/terms/created> "2020-01-01" .
"""

RDFXML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:skos="http://www.w3.org/2004/02/skos/core#">
  <rdf:Description rdf:about="http://vocab.example.org/term/9">
    <skos:prefLabel>benthic zone</skos:prefLabel>
    <skos:altLabel>sea floor</skos:altLabel>
  </rdf:Description>
</rdf:RDF>
"""


@pytest.fixture()
def nt_path(tmp_path):
    p = tmp_path / "vocab.nt"
    p.write_text(NT)
    return str(p)


def test_preflabel_filter_and_projection(spark, nt_path):
    df = sssom_from_ntriples(spark, nt_path)
    assert df.columns == SSSOM_COLUMNS
    rows = {r["subject_id"]: r["subject_label"] for r in df.collect()}
    # only prefLabel triples survive (sssom.py:52)
    assert rows == {
        "http://vocab.example.org/term/1": "aquatic ecosystems",
        "http://vocab.example.org/term/2": "kelp forest",
    }
    # 10 padding columns are "" (sssom.py:54)
    first = df.collect()[0]
    assert all(first[c] == "" for c in SSSOM_COLUMNS[2:])


def test_from_lter_writes_tsv_and_yaml(spark, nt_path, tmp_path):
    out = str(tmp_path / "out")
    import os

    os.makedirs(out)
    res = from_lter(spark, nt_path, out)
    with open(res["data_path"]) as fh:
        header = fh.readline().strip().split("\t")
    assert header == SSSOM_COLUMNS
    with open(res["meta_path"]) as fh:
        meta = fh.read()
    assert meta.splitlines() == [
        "mapping_set_id:",
        "license:",
        "mapping_set_version:",
        "mapping_set_description:",
        "object_source:",
        "subject_source:",
        "curie_map:",
    ]
    # write-once contract (sssom.py:33-35)
    with pytest.raises(FileExistsError):
        from_lter(spark, nt_path, out)


def test_rdfxml_conversion(spark, tmp_path):
    rdf = tmp_path / "v.rdf"
    rdf.write_text(RDFXML)
    nt = tmp_path / "v.nt"
    rdfxml_to_ntriples(str(rdf), str(nt))
    df = sssom_from_ntriples(spark, str(nt))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["subject_label"] == "benthic zone"
