"""Digest query lifecycle (§3.1/§3.3): Task → blocks/cards result tree.

The reference's user-facing surface, re-expressed over the Spark
pipeline in operators/digest.py:

* ``Task`` — the reference's query descriptor (src/task.rs:7-30) with
  its defaults: last-7-days window truncated to midnight UTC,
  top_count=3 (task.rs:33-53); JSON round-trip (task.rs:55-63).
* ``create_digest_data`` — the Block/Card tree with the reference's
  block order, headers, icons, filters (workers/digest.rs:53-100),
  card shaping with null-count cards filtered (workers/card.rs:27-44),
  empty blocks dropped.
* ``digest_json`` — the /data/ slim payload: blocks with header +
  [id, count] pairs, null→0 (workers/digest.rs:31-50).

One Spark job per digest (the single unpivot+window top-k); everything
after the k×4 collected rows is driver-side shaping, same as the
reference.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import asdict, dataclass, field
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame

from ..functions.format import THIN_SPACE  # noqa: F401  (re-export convenience)
from .digest import METRICS, top_posts

# block order + presentation constants (workers/digest.rs:62-87)
BLOCK_SPEC = [
    ("replies", "По комментариям", "💬", ""),
    ("reactions", "По реакциям", "👏", ""),
    ("forwards", "По репостам", "🔁", "filter-blue"),
    ("views", "По просмотрам", "👁️", "filter-blue"),
]


def _icon_url(emoji: str, base: str = "") -> str:
    """util.rs:5-10 — first char → emoji_u{codepoint:04x}.svg."""
    cp = ord(emoji[0])
    return f"{base}emoji_u{cp:04x}.svg"


def _default_window(now: datetime | None = None) -> tuple[int, int]:
    """task.rs:33-53 — [today-7d, today 00:00) UTC, unix seconds."""
    now = now or datetime.now(timezone.utc)
    midnight = now.replace(hour=0, minute=0, second=0, microsecond=0)
    return int((midnight - timedelta(days=7)).timestamp()), int(
        midnight.timestamp()
    )


@dataclass
class Task:
    channel_name: str = "ithueti"
    top_count: int = 3
    mode: str = "watermark"
    editor_choice_post_id: int = 0
    from_date: int = 0  # unix sec UTC
    to_date: int = 0
    task_id: str = field(default_factory=lambda: uuid.uuid4().hex)

    def __post_init__(self):
        if self.from_date == 0 and self.to_date == 0:
            self.from_date, self.to_date = _default_window()
        if self.from_date < 0 or self.to_date < 0:
            raise ValueError("Provided date is not allowed")  # main.rs:464-466

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Task":
        return cls(**json.loads(s))


def run_digest(posts: DataFrame, task: Task) -> dict:
    """Execute the §3.1 pipeline for one channel and shape the result."""
    from pyspark.sql import functions as F

    scoped = posts.where(F.col("channel") == task.channel_name)
    top = top_posts(
        scoped,
        top_count=task.top_count,
        from_ts=datetime.fromtimestamp(task.from_date, timezone.utc).replace(
            tzinfo=None
        ),
        to_ts=datetime.fromtimestamp(task.to_date, timezone.utc).replace(
            tzinfo=None
        ),
    )
    rows = top.collect()  # k x 4 rows — driver-side shaping from here on
    by_metric: dict[str, list] = {m: [] for m in METRICS}
    for r in sorted(rows, key=lambda r: (r["metric"], r["rank"])):
        by_metric[r["metric"]].append(r)
    return create_digest_data(by_metric, task)


def create_digest_data(by_metric: dict[str, list], task: Task) -> dict:
    blocks = []
    for metric, header, emoji, filt in BLOCK_SPEC:
        cards = [
            {
                "id": int(r["id"]),
                "count": int(r["count"]),
                "header": "UNDEFINED",  # card.rs:18 default
                "icon": _icon_url("⚠️"),
                "filter": "",
            }
            for r in by_metric.get(metric, [])
            if r["count"] is not None  # card.rs:40-41
        ]
        if not cards:  # empty blocks dropped (digest.rs:88-90)
            continue
        blocks.append(
            {
                "header": header,
                "icon": _icon_url(emoji),
                "filter": filt,
                "cards": cards,
            }
        )
    return {
        "blocks": blocks,
        "editor_choice_id": task.editor_choice_post_id,
        "channel_name": task.channel_name,
    }


def digest_json(digest: dict) -> dict:
    """The /data/ slim payload (digest.rs:31-50): cards → [id, count]."""
    return {
        "status": "ready",
        "blocks": [
            {
                "header": b["header"],
                "cards": [[c["id"], c["count"] or 0] for c in b["cards"]],
            }
            for b in digest["blocks"]
        ],
        "editor_choice_id": digest["editor_choice_id"],
        "channel_name": digest["channel_name"],
    }
