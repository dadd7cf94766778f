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


#: F11 — the reference's media-cache extension table
#: (post_data.rs:427-443), verbatim.
MIME_EXT = {
    "video/mp4": "mp4",
    "video/quicktime": "mov",
    "video/webm": "webm",
    "audio/mpeg": "mp3",
    "audio/ogg": "ogg",
    "audio/mp4": "m4a",
    "image/jpeg": "jpg",
    "image/png": "png",
    "image/webp": "webp",
    "image/gif": "gif",
    "application/pdf": "pdf",
    "application/zip": "zip",
}


def mime_ext(mime: Column) -> Column:
    """F11 — mime type → file extension with 'bin' fallback
    (post_data.rs:427-443). Map-literal lookup (codegen, no UDF);
    unknown AND null mimes both fall back to 'bin' like the Rust
    catch-all arm."""
    m = F.create_map(*[F.lit(x) for kv in MIME_EXT.items() for x in kv])
    return F.coalesce(m[mime], F.lit("bin"))


def best_photo_size(sizes: Column) -> Column:
    """F13 — argmax over array<struct<...,size:long>>: pick the element
    with the largest size (post_data.rs:276-301) via array reduce."""
    return F.aggregate(
        sizes,
        F.element_at(sizes, 1),
        lambda acc, s: F.when(s["size"] > acc["size"], s).otherwise(acc),
    )
