"""Deterministic synthetic data generators (seed-stable, no external data).

Two tables per FIXTURES.md:

* ``transcripts(conv_id, turn_idx, role, text, tool, ts)`` — the engine's
  primary fact table (BASELINE.json input_hint). Zipf-skewed
  turns-per-conversation to exercise salted merges.
* ``posts(channel, id, date, views, forwards, replies, reactions, message,
  grouped_id, fetched_at)`` — reference-shaped table mirroring
  /root/reference/src/cache.rs:79-92 and src/post.rs:8-19, used for
  digest-semantics parity tests (null metrics, albums, duplicates).

Generation is pure numpy (vectorized) and writes plain pandas → parquet so
it can run without a SparkSession; Spark reads the files back. At real
scale the same logic runs distributed via ``mapInPandas`` over a range
DataFrame (see ``transcripts_df``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.42, 0.42, 0.02, 0.14])
TOOLS = np.array([f"tool_{i:02d}" for i in range(40)])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog alpha beta gamma delta epsilon "
    "query spark sketch digest merge partition shuffle salt vector arrow "
    "token stream batch window rank metric cache parquet column row".split()
)

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")  # µs


def _zipf_clipped(rng: np.random.Generator, a: float, lo: int, hi: int, size: int) -> np.ndarray:
    v = rng.zipf(a, size=size)
    return np.clip(v, lo, hi)


def _make_texts(rng: np.random.Generator, n: int) -> np.ndarray:
    """Token-soup strings, char length ~ lognormal(5,1) clipped [1, 20000]."""
    target_chars = np.clip(rng.lognormal(5.0, 1.0, size=n), 1, 20_000).astype(np.int64)
    # ~6 chars/word incl. space; sample word indices in one draw.
    n_words = np.maximum(1, target_chars // 6)
    total = int(n_words.sum())
    idx = rng.integers(0, len(_WORDS), size=total)
    words = _WORDS[idx]
    bounds = np.cumsum(n_words)[:-1]
    return np.array([" ".join(chunk) for chunk in np.split(words, bounds)], dtype=object)


def gen_transcripts(sf: float, seed: int = 42) -> pd.DataFrame:
    """Generate the transcripts fact table at scale factor ``sf``.

    conversations ≈ 1000 × sf × 1000 (sf0.001 → 1000 convs ≈ 4k turns).
    """
    rng = np.random.default_rng(seed)
    n_conv = max(1, int(1_000_000 * sf))
    # Zipf(2.1) clipped [1,500]: mean ≈ 5, max hits the clip — enough
    # skew that one conversation dwarfs the median (salting target)
    # while total rows stay ≈ 5k/50k/500k at sf 0.001/0.01/0.1.
    turns_per = _zipf_clipped(rng, 2.1, 1, 500, n_conv)
    n = int(turns_per.sum())

    conv_ord = np.repeat(np.arange(n_conv), turns_per)
    conv_id = np.char.add("conv", np.char.zfill(conv_ord.astype(str), 8))
    # turn_idx: 0..k-1 within each conversation
    starts = np.concatenate(([0], np.cumsum(turns_per)[:-1]))
    turn_idx = (np.arange(n) - np.repeat(starts, turns_per)).astype(np.int32)

    role = ROLES[rng.choice(len(ROLES), size=n, p=ROLE_P)]
    tool = np.where(
        role == "tool",
        TOOLS[np.minimum(rng.zipf(1.5, size=n) - 1, len(TOOLS) - 1)],
        None,
    )
    text = _make_texts(rng, n)

    # conversation start uniform over 90 days from 2024-01-01; inter-turn
    # gaps ~ Exp(mean 45 s) — ground truth for the lag(ts) latency metric.
    conv_start_us = (rng.uniform(0, 90 * 86400, size=n_conv) * 1e6).astype(np.int64)
    gaps_us = (rng.exponential(45.0, size=n) * 1e6).astype(np.int64)
    # first turn of each conversation gets gap 0 then cumulative within conv
    gaps_us[starts] = 0
    cum = np.cumsum(gaps_us)
    base = np.repeat(cum[starts], turns_per)
    ts_us = EPOCH_2024 + np.repeat(conv_start_us, turns_per) + (cum - base)

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts_us.astype("datetime64[us]"),
        }
    )


def gen_posts(n_posts: int = 3000, seed: int = 42, n_channels: int = 3) -> pd.DataFrame:
    """Reference-shaped posts table (src/post.rs:8-19 semantics).

    Each engagement metric is null with p=0.1 (Option<i32> in the
    reference); ~15% of rows belong to albums (grouped_id) of 2-10
    consecutive ids; ~5% duplicated (channel,id) rows appended to test
    the sort+dedup path (/root/reference/src/main.rs:162-163).
    """
    rng = np.random.default_rng(seed)
    per_ch = n_posts // n_channels
    rows = []
    for c in range(n_channels):
        ids = np.arange(1, per_ch + 1, dtype=np.int32)
        date_us = EPOCH_2024 + np.sort(
            (rng.uniform(0, 2 * 365 * 86400, size=per_ch) * 1e6).astype(np.int64)
        )
        metrics = {}
        for m in ("views", "forwards", "replies", "reactions"):
            v = np.clip(rng.lognormal(6 if m == "views" else 3, 1.2, per_ch), 0, 2**31 - 1)
            v = v.astype("float64")
            v[rng.random(per_ch) < 0.1] = np.nan  # Option::None
            metrics[m] = v
        grouped = np.full(per_ch, np.nan)
        i = 0
        gid = c * 10_000_000 + 1
        while i < per_ch:
            if rng.random() < 0.05:
                size = int(rng.integers(2, 11))
                grouped[i : i + size] = gid
                gid += 1
                i += size
            else:
                i += 1
        fetched_us = EPOCH_2024 + 2 * 365 * 86400 * 1_000_000 - (
            rng.uniform(0, 10 * 86400, per_ch) * 1e6
        ).astype(np.int64)
        rows.append(
            pd.DataFrame(
                {
                    "channel": f"channel{c}",
                    "id": ids,
                    "date": date_us.astype("datetime64[us]"),
                    **{
                        m: pd.array(
                            [None if np.isnan(x) else int(x) for x in v], dtype="Int32"
                        )
                        for m, v in metrics.items()
                    },
                    "message": [f"post {c}/{i}" for i in ids],
                    "grouped_id": pd.array(
                        np.where(np.isnan(grouped), None, grouped), dtype="Int64"
                    ),
                    "fetched_at": fetched_us.astype("datetime64[us]"),
                }
            )
        )
    df = pd.concat(rows, ignore_index=True)
    # duplicate ~5% of rows (cache-overlap simulation)
    dup = df.sample(frac=0.05, random_state=seed)
    return pd.concat([df, dup], ignore_index=True)


def write_transcripts(out_dir: str, sf: float, seed: int = 42) -> str:
    """Write transcripts parquet for ``sf`` if absent; return the path.

    Layout note: a single file locally; at scale this is written
    partitioned by days(ts) with sort order (conv_id, turn_idx) — see
    sources/transcripts.py.
    """
    suffix = "" if seed == 42 else f"_seed{seed}"
    path = os.path.join(out_dir, f"transcripts_sf{sf}{suffix}.parquet")
    if not os.path.exists(path):
        os.makedirs(out_dir, exist_ok=True)
        # many row groups → parallel scan tasks (one-row-group files
        # serialize every downstream stage onto a single core);
        # tmp+rename so a crash mid-write can't leave a truncated file
        # that existence-checks would trust forever
        tmp = path + ".tmp"
        gen_transcripts(sf, seed).to_parquet(
            tmp, index=False, row_group_size=16384
        )
        os.replace(tmp, path)
    return path


def write_posts(out_dir: str, n_posts: int = 3000, seed: int = 42) -> str:
    suffix = "" if seed == 42 else f"_seed{seed}"
    path = os.path.join(out_dir, f"posts_{n_posts}{suffix}.parquet")
    if not os.path.exists(path):
        os.makedirs(out_dir, exist_ok=True)
        tmp = path + ".tmp"
        gen_posts(n_posts, seed).to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return path
