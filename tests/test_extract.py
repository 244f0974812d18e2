"""Byte-identical text extraction (parser.py:79-87 invariant)."""

from pyspark.sql import functions as F

from sparkmedkg import extract


def test_extract_text_byte_identical(docs):
    out = extract.with_extracted_text(docs)
    mismatches = out.where(
        F.col("extracted_text") != F.col("text")
    ).count()
    assert mismatches == 0


def test_extract_text_py_roundtrip():
    text = "Aspirin & phenylketonuria (PKU) study."
    html = b"<html><body><p>" + text.encode() + b"</p></body></html>"
    assert extract.extract_text_py(html) == text
    assert extract.extract_text_py(None) == ""
