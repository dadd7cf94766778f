"""Presentation scalar functions (F5, F6, F8, F9) as Column expressions.

Each mirrors a reference behavior exactly; all are built-ins (codegen)
— no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

THIN_SPACE = " "


def format_date(ts: Column) -> Column:
    """F5 — '%d/%m/%Y %H:%M' UTC (main.rs:1236-1238)."""
    return F.date_format(ts, "dd/MM/yyyy HH:mm")


def format_number_thin_space(n: Column) -> Column:
    """F6 — digits grouped by 3 from the right, joined with U+2009
    (html_renderer.rs:10-31). Negative numbers keep the sign outside
    the grouping, matching Rust's to_string() chunking of '-' with the
    leading group."""
    grouped = F.regexp_replace(
        F.format_number(n.cast("long"), 0), ",", THIN_SPACE
    )
    return grouped


def emoji_codepoint_url(ch: Column, base: str = "emoji_u") -> Column:
    """F8 — first char → 'emoji_u{codepoint:04x}.svg' (util.rs:5-10).

    Spark's ascii() returns the full Unicode code point of the first
    character (incl. supplementary planes), matching Rust's
    `char as u32`."""
    hexcp = F.format_string("%04x", F.ascii(ch))  # lpad would truncate >4
    return F.concat(F.lit(base), hexcp, F.lit(".svg"))


def html_escape(text: Column) -> Column:
    """F9 — & < > \" escaping (main.rs:1357-1362); order matters: &
    first."""
    out = F.regexp_replace(text, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    out = F.regexp_replace(out, '"', "&quot;")
    return out


def best_photo_size(sizes: Column) -> Column:
    """F13 — argmax over array<struct<...,size:long>>: pick the element
    with the largest size (post_data.rs:276-301) via array reduce."""
    return F.aggregate(
        sizes,
        F.element_at(sizes, 1),
        lambda acc, s: F.when(s["size"] > acc["size"], s).otherwise(acc),
    )
