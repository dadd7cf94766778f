"""PostData nested document model (§1: the reference's wide nested row).

Spark StructType mirror of /root/reference/src/post_data.rs:6-51 with
the nested media structs (:82-182) — Spark handles arbitrary nesting
natively (SURVEY §1.3), so the entire document is one typed column tree;
no JSON blobs.

Surface parity:
* ``post_json(posts, channel, id)`` — the /post/<ch>/<id> endpoint
  (main.rs:1164-1186, builder post_data.rs:446-488): point lookup →
  nested document → JSON string (None fields dropped, matching serde's
  skip_serializing_if).
* ``album_expand`` — the ±10-neighbor album expansion
  (workers/tg.rs:211-229): window over grouped_id collecting AlbumItems
  sorted by id.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.timeutil import epoch_sec
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ENTITY = StructType(
    [
        StructField("type", StringType()),
        StructField("offset", IntegerType()),
        StructField("length", IntegerType()),
        StructField("url", StringType()),
        StructField("language", StringType()),
    ]
)

PHOTO = StructType(
    [StructField("url", StringType()), StructField("width", IntegerType()),
     StructField("height", IntegerType())]
)
VIDEO = StructType(
    [StructField("url", StringType()), StructField("thumb_url", StringType()),
     StructField("duration", DoubleType()),
     StructField("round_message", BooleanType())]
)
DOCUMENT = StructType(
    [StructField("url", StringType()), StructField("name", StringType()),
     StructField("mime", StringType()), StructField("size", LongType())]
)
CONTACT = StructType(
    [StructField("phone", StringType()), StructField("first_name", StringType()),
     StructField("last_name", StringType())]
)
WEB_PAGE = StructType(
    [StructField("url", StringType()), StructField("site_name", StringType()),
     StructField("title", StringType()), StructField("description", StringType())]
)
FORWARD = StructType(
    [StructField("from_name", StringType()), StructField("channel_post", IntegerType()),
     StructField("post_author", StringType())]
)
ALBUM_ITEM = StructType(
    [StructField("msg_id", IntegerType()), StructField("photo", PHOTO),
     StructField("video", VIDEO)]
)

POST_DATA = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("date", LongType(), False),  # unix sec (post_data.rs:9)
        StructField("edit_date", LongType()),
        StructField("url", StringType(), False),
        StructField("channel_title", StringType()),
        StructField("text", StringType(), False),
        StructField("entities", ArrayType(ENTITY), False),
        StructField("photo", PHOTO),
        StructField("video", VIDEO),
        StructField("document", DOCUMENT),
        StructField("contact", CONTACT),
        StructField("web_page", WEB_PAGE),
        StructField("views", IntegerType()),
        StructField("forwards", IntegerType()),
        StructField("replies", IntegerType()),
        StructField("reactions", IntegerType()),
        StructField("post_author", StringType()),
        StructField("forward_from", FORWARD),
        StructField("reply_to_msg_id", IntegerType()),
        StructField("grouped_id", LongType()),
        StructField("pinned", BooleanType(), False),
        StructField("album", ArrayType(ALBUM_ITEM), False),
    ]
)


def to_post_data(posts: DataFrame, channel_base: str = "https://t.me") -> DataFrame:
    """posts fact rows → PostData documents (builder parity,
    post_data.rs:446-488; fields absent from the narrow fact table are
    typed nulls)."""
    null = lambda t: F.lit(None).cast(t)  # noqa: E731
    return posts.select(
        F.col("id").cast("int").alias("id"),
        # timezone-free epoch seconds (functions/timeutil.py) — the
        # reference stores the post date as a naive unix int
        epoch_sec("date", dict(posts.dtypes)["date"]).alias("date"),
        null("long").alias("edit_date"),
        F.concat(
            F.lit(f"{channel_base}/"), F.col("channel"), F.lit("/"), F.col("id")
        ).alias("url"),
        null("string").alias("channel_title"),
        F.coalesce(F.col("message"), F.lit("")).alias("text"),
        F.array().cast(ArrayType(ENTITY)).alias("entities"),
        null(PHOTO).alias("photo"),
        null(VIDEO).alias("video"),
        null(DOCUMENT).alias("document"),
        null(CONTACT).alias("contact"),
        null(WEB_PAGE).alias("web_page"),
        F.col("views").cast("int"),
        F.col("forwards").cast("int"),
        F.col("replies").cast("int"),
        F.col("reactions").cast("int"),
        null("string").alias("post_author"),
        null(FORWARD).alias("forward_from"),
        null("int").alias("reply_to_msg_id"),
        F.col("grouped_id").cast("long"),
        F.lit(False).alias("pinned"),
        F.array().cast(ArrayType(ALBUM_ITEM)).alias("album"),
        F.col("channel"),
    )


def post_json(posts: DataFrame, channel: str, post_id: int) -> str | None:
    """/post/<channel>/<id> — point lookup → JSON document, None fields
    dropped like serde skip_serializing_if (post_data.rs:12-48)."""
    rows = (
        to_post_data(posts)
        .where((F.col("channel") == channel) & (F.col("id") == post_id))
        .drop("channel")
        .limit(1)
        .collect()
    )
    if not rows:
        return None
    doc = rows[0].asDict(recursive=True)
    return json.dumps(
        {k: v for k, v in doc.items() if v is not None}, sort_keys=True
    )


def media_cache_path(media_id, mime) -> Column:
    """Media-cache blob key '{media_id}.{ext}' (cache.rs:370-373): the
    extension comes from the F11 mime→ext table (post_data.rs:427-443).
    Used to derive the blob-store object key for a document/video row."""
    from ..functions.format import mime_ext

    media_id = F.col(media_id) if isinstance(media_id, str) else media_id
    mime = F.col(mime) if isinstance(mime, str) else mime
    return F.concat(media_id.cast("string"), F.lit("."), mime_ext(mime))


def album_expand(posts: DataFrame, neighbor_window: int = 10) -> DataFrame:
    """J2 — per album: the member list as array<struct> sorted by id
    (workers/tg.rs:211-229 fetches id±10 then filters same grouped_id;
    on a table the equi-group IS the album, no over-fetch needed)."""
    return (
        posts.where(F.col("grouped_id").isNotNull())
        .groupBy("channel", "grouped_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("id"), F.col("message")))
            ).alias("items"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
