"""JSON API source: nested-path extraction, URL templating, field
concatenation (SURVEY.md §2.1 S5, §2.2 M18-M20).

Semantics mirror the reference (cites into
/root/reference/meilisearchcrawler/crawler.py):

- ``get_nested_value`` — :444-467: dotted path with ``[]`` array fan-out
  (``authors[].name`` collects across list elements, flattening nested
  lists); missing keys → None; fan-out drops falsy results.
- ``render_template`` — :1255-1262, 1271-1281: ``{{key}}`` substitution
  from the item (nested paths allowed); unresolved placeholders reject the
  item (returns None).
- ``concat_content`` — :1283-1292: comma-separated key list → values joined
  with " "; list values flattened with " ".

The live one-GET tier (:1236-1247) is replaced by items provided as rows;
``JsonItemsBatch`` is the ``map_batches`` projection producing document rows
via the same mapping config as sites.yml's ``json`` block.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

_PLACEHOLDER_RE = re.compile(r"\{\{([^}]+)\}\}")


def get_nested_value(data, key_path: str):
    if not isinstance(data, (dict, list)) or not key_path:
        return None
    keys = key_path.replace("[]", ".[]").split(".")
    current = data
    for i, key in enumerate(keys):
        if current is None:
            return None
        if key == "[]":
            if not isinstance(current, list):
                return None
            remaining = ".".join(keys[i + 1:])
            if not remaining:
                return current
            results = []
            for item in current:
                res = get_nested_value(item, remaining)
                if res:
                    results.extend(res if isinstance(res, list) else [res])
            return results
        if not isinstance(current, dict):
            return None
        current = current.get(key)
    return current


def render_template(template: str, item: dict) -> str | None:
    """{{key}} substitution; None when any placeholder is unresolved
    (reference: rejects the item, crawler.py:1259-1262)."""
    out = template
    for m in _PLACEHOLDER_RE.finditer(template):
        val = get_nested_value(item, m.group(1).strip())
        if val is None:
            return None
        out = out.replace(m.group(0), str(val))
    return out


def concat_content(item: dict, keys_csv: str) -> str:
    parts = []
    for key in [k.strip() for k in keys_csv.split(",") if k.strip()]:
        val = get_nested_value(item, key)
        if val is None:
            continue
        if isinstance(val, list):
            parts.append(" ".join(str(v) for v in val))
        else:
            parts.append(str(val))
    return " ".join(parts)


class JsonItemsBatch:
    """``map_batches`` stage: rows with an ``item`` JSON-string column →
    document rows per the sites.yml json mapping
    {root-resolved upstream, title, url, content, image}."""

    def __init__(self, url_template: str, title_key: str, content_keys: str):
        self.url_template = url_template
        self.title_key = title_key
        self.content_keys = content_keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"url": [], "title": [], "content": []}
        for raw in batch["item"].to_pylist():
            item = json.loads(raw)
            url = render_template(self.url_template, item)
            if url is None:
                continue  # unresolved placeholder → item rejected
            title = get_nested_value(item, self.title_key)
            out["url"].append(url)
            out["title"].append(str(title) if title is not None else "")
            out["content"].append(concat_content(item, self.content_keys))
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "title": pa.array(out["title"], pa.string()),
                "content": pa.array(out["content"], pa.string()),
            }
        )


# ship by value for Ray workers
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
