from __future__ import annotations

from go_integ_spark.sources.parsers import parse_jsonl, parse_xml


def test_jsonl():
    assert parse_jsonl(b'{"a":1}\n{"a":2}\n\n{"a":3}') == [{"a": 1}, {"a": 2}, {"a": 3}]


XML_DOC = b"""
<feed version="2">
  <title>orders</title>
  <entry id="1"><sku>A-1</sku><qty>3</qty></entry>
  <entry id="2"><sku>B-2</sku><qty>1</qty></entry>
  <note>this leaf text is much longer than thirty bytes and must not be truncated</note>
</feed>
"""


def test_xml_declared_arrays_attrs_and_leaf_text():
    out = parse_xml(XML_DOC, arrays=["entry"])
    # attributes are @-prefixed strings (xml.go:157-159)
    assert out["@version"] == "2"
    # declared array path -> JSON array, repeated elements appended
    assert [e["sku"] for e in out["entry"]] == ["A-1", "B-2"]
    assert out["entry"][0]["@id"] == "1"
    # leaf elements collapse to text — WITHOUT the reference's 30-byte
    # truncation (xml.go:168-171, deliberately fixed)
    assert out["note"].startswith("this leaf text is much longer than thirty bytes")
    assert len(out["note"]) > 30


def test_xml_undeclared_repeat_overwrites():
    out = parse_xml(b"<r><x>1</x><x>2</x></r>")
    assert out["x"] == "2"  # last wins (xml.go:151-155 default mode)


def test_xml_prefix_dig():
    doc = b"<root><data><item>v</item></data></root>"
    assert parse_xml(doc, prefix="data") == {"item": "v"}
