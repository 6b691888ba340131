"""Response-body parsers: JSONL and XML→JSON.

- JSONL (reference pkg/jsonl/jsonl.go:13-28): newline-delimited JSON
  -> list of records. At scale this shape is ``spark.read.json``
  (native JSONL); this parser is the in-reader path for HTTP bodies.

- XML→JSON (reference pkg/xml/xml.go): streaming decode with
  * declared array paths (dot-separated, relative to the document
    root / optional ``prefix``) — only declared paths become JSON
    arrays; repeated undeclared siblings overwrite (xml.go:143-155);
  * attributes as ``@``-prefixed string fields (xml.go:157-159);
  * childless, attributeless elements collapse to their text content
    (xml.go:163-173). The reference truncates leaf text to 30 bytes
    (xml.go:168-171) — a bug we deliberately do NOT replicate
    (SURVEY.md §7 hard part d);
  * ``prefix`` ("a.b") digs the returned subtree (xml.go:131).

  Spark-scale equivalent: ``from_xml`` with an explicit schema; this
  parser covers HTTP connector responses where the declared-array
  semantics must match the reference.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from typing import Any


def parse_jsonl(data: bytes | str) -> list[Any]:
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    out = []
    for line in data.splitlines():
        line = line.strip()
        if line:
            out.append(json.loads(line))
    return out


def _local(tag: str) -> str:
    # strip {namespace}
    return tag.rsplit("}", 1)[-1]


class XmlDecoder:
    def __init__(
        self,
        prefix: str = "",
        arrays: list[str] | None = None,
        attr_prefix: str = "@",
    ):
        self.prefix = prefix.split(".") if prefix else []
        self.attr_prefix = attr_prefix
        # declared array paths are absolute from the document root,
        # prefixed like the reference (xml.go:78-80)
        self.arrays = [
            tuple(self.prefix + a.split(".")) for a in (arrays or [])
        ]

    def parse(self, data: bytes | str):
        root = ET.fromstring(data)
        doc = {_local(root.tag): self._convert(root, (_local(root.tag),))}
        # dig the prefix subtree (xml.go:131); the root element name
        # is the first path component.
        cur: Any = doc
        for part in [p for p in [_local(root.tag)] + self.prefix if p]:
            if not isinstance(cur, dict) or part not in cur:
                return None
            cur = cur[part]
        return cur

    def _convert(self, elem: ET.Element, path: tuple[str, ...]):
        obj: dict[str, Any] = {
            self.attr_prefix + _local(k): str(v) for k, v in elem.attrib.items()
        }
        children = list(elem)
        if not obj and not children:
            # leaf -> full text (reference truncates to 30 bytes; fixed)
            return (elem.text or "").strip()
        for child in children:
            name = _local(child.tag)
            child_path = path + (name,)
            val = self._convert(child, child_path)
            if child_path[1:] in self.arrays or child_path in self.arrays:
                obj.setdefault(name, [])
                if not isinstance(obj[name], list):
                    obj[name] = [obj[name]]
                obj[name].append(val)
            else:
                # undeclared repeats overwrite (xml.go:151-155 default)
                obj[name] = val
        return obj


def parse_xml(
    data: bytes | str, prefix: str = "", arrays: list[str] | None = None
):
    return XmlDecoder(prefix=prefix, arrays=arrays).parse(data)
