"""Entity-span rendering (F10/F12): (text, entities[]) → HTML.

Faithful port of /root/reference/src/main.rs:1268-1355 semantics:

* offsets/lengths are CHAR (code point) indexed, not bytes
  (main.rs:1269-1270 `chars().collect()`);
* events sorted by (offset, close-before-open) (main.rs:1325 — Rust
  sorts bool false<true so closes come first at equal offsets);
* body text escapes & < > only; attribute values escape & < > "
  (html_escape, main.rs:1357-1362);
* the 20+-case entity-type dispatch (post_data.rs:186-237 analog) maps
  telegram entity kinds to tags; unknown kinds are skipped.

This is a presentation-layer operator (per-row string building is
inherent to HTML generation), shipped as an Arrow-batched pandas UDF:
batches stream through Arrow, each row rendered by the port below. The
analytics-path invariant still holds: `text` itself is never modified —
the per-turn text-equality tests cover the row-preserving pipelines.

Entity schema: array<struct<type:string, offset:int, length:int,
url:string, language:string>> (PostData.entities, post_data.rs:66-80).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

ENTITY_SCHEMA = (
    "array<struct<type:string,offset:int,length:int,url:string,language:string>>"
)


def _attr_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


def _open_close(kind: str, chars: list[str], off: int, length: int, url, lang):
    n = len(chars)
    if kind == "bold":
        return "<b>", "</b>"
    if kind == "italic":
        return "<i>", "</i>"
    if kind == "underline":
        return "<u>", "</u>"
    if kind == "strike":
        return "<s>", "</s>"
    if kind == "code":
        return "<code>", "</code>"
    if kind == "pre":
        if lang:
            return (
                f'<pre><code class="language-{_attr_escape(lang)}">',
                "</code></pre>",
            )
        return "<pre><code>", "</code></pre>"
    if kind == "text_url":
        if url:
            return (
                f'<a href="{_attr_escape(url)}" target="_blank" rel="noopener">',
                "</a>",
            )
        return "<span>", "</span>"
    if kind == "url":
        url_text = "".join(chars[off : min(off + length, n)])
        return (
            f'<a href="{_attr_escape(url_text)}" target="_blank" rel="noopener">',
            "</a>",
        )
    if kind == "mention":
        mention = "".join(chars[off : min(off + length, n)])
        username = mention.lstrip("@")
        return (
            f'<a href="https://t.me/{_attr_escape(username)}" target="_blank" rel="noopener">',
            "</a>",
        )
    if kind == "spoiler":
        return '<span class="spoiler">', "</span>"
    if kind == "blockquote":
        return "<blockquote>", "</blockquote>"
    if kind in ("hashtag", "cashtag", "phone", "email", "bank_card"):
        return "<span>", "</span>"
    return None


def render_entities_py(text: str, entities) -> str:
    """The reference algorithm, line for line (main.rs:1268-1355)."""
    chars = list(text)
    n = len(chars)
    events: list[tuple[int, bool, str]] = []
    if entities is None:
        entities = []
    for e in entities:
        tags = _open_close(
            e["type"], chars, int(e["offset"]), int(e["length"]),
            e.get("url"), e.get("language"),
        )
        if tags is None:
            continue
        events.append((int(e["offset"]), True, tags[0]))
        events.append((int(e["offset"]) + int(e["length"]), False, tags[1]))
    events.sort(key=lambda ev: (ev[0], ev[1]))  # False (close) before True

    out: list[str] = []
    pos = 0

    def emit_text(upto: int):
        nonlocal pos
        while pos < upto and pos < n:
            ch = chars[pos]
            if ch == "&":
                out.append("&amp;")
            elif ch == "<":
                out.append("&lt;")
            elif ch == ">":
                out.append("&gt;")
            else:
                out.append(ch)
            pos += 1

    for offset, _is_open, tag in events:
        emit_text(offset)
        out.append(tag)
    emit_text(n)
    return "".join(out)


@pandas_udf(StringType())
def render_entities(text: pd.Series, entities: pd.Series) -> pd.Series:
    return pd.Series(
        [
            render_entities_py(t if t is not None else "", ents)
            for t, ents in zip(text, entities)
        ]
    )


def rendered_html(text_col: Column, entities_col: Column) -> Column:
    return render_entities(text_col, entities_col)
