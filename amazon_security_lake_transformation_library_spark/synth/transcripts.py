"""Deterministic synthetic multi-turn transcripts (FIXTURES.md §1).

Schema (BASELINE.json ``input_hint``)::

    conv_id string, turn_idx int32, role string, text string,
    tool string (mostly NULL), ts timestamp (UTC, non-decreasing per conv)

Distributional requirements covered:
  * one hot conversation holding ~``hot_frac`` of all rows (skew/salting path)
  * Pareto long-tail over conversation lengths
  * inter-turn gaps including >30 min (session boundaries) and 0 s ties
  * NULL runs in ``tool`` spanning session boundaries (forward-fill)
  * ``text`` is a pure deterministic function of (conv_id, turn_idx)
    so byte-equality is checkable anywhere

Everything is seeded (default 42); no wall clock, no external data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_VOCAB = (
    "the a of to and in is scan join agg window shuffle spark batch stream "
    "filter sort merge hash key value table row column query plan turn tool "
    "user agent reply call result state session token text feature vector"
).split()

_ROLES = np.array(["user", "assistant", "tool"])

BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")


def text_for(conv_id: str, turn_idx: int) -> str:
    """Pure function of (conv_id, turn_idx) -> deterministic token string."""
    h = hashlib.md5(f"{conv_id}:{turn_idx}".encode()).digest()
    n = 4 + h[0] % 24
    words = [_VOCAB[h[(1 + i) % 16] % len(_VOCAB)] for i in range(n)]
    return f"{conv_id}#{turn_idx} " + " ".join(words)


def gen_transcripts(
    n_convs: int = 200,
    mean_turns: int = 20,
    seed: int = 42,
    hot_frac: float = 0.10,
) -> pd.DataFrame:
    """Generate the transcripts table as a pandas DataFrame (sorted by
    conv_id, turn_idx). Deterministic for a given (n_convs, mean_turns, seed).
    """
    rng = np.random.default_rng(seed)

    lengths = np.maximum(
        2, (rng.pareto(1.7, n_convs) * mean_turns * 0.7 + 2).astype(np.int64)
    )
    lengths = np.minimum(lengths, mean_turns * 40)
    total = int(lengths.sum())
    # hot conversation: ~hot_frac of ALL rows ends up in conv 0
    hot_len = max(int(hot_frac / (1.0 - hot_frac) * total), mean_turns * 4)
    lengths[0] = hot_len

    frames = []
    for i, length in enumerate(lengths):
        cid = f"conv_{i:08d}"
        t = np.arange(length, dtype=np.int32)

        # roles: user/assistant alternate with deterministic perturbation,
        # ~15% tool turns
        r = rng.random(length)
        roles = np.where(t % 2 == 0, "user", "assistant").astype(object)
        roles[r < 0.15] = "tool"
        roles[0] = "user"

        tools = np.array([None] * length, dtype=object)
        tool_rows = roles == "tool"
        tool_ids = rng.integers(0, 12, size=length)
        tools[tool_rows] = np.array(
            [f"tool_{k:02d}" for k in tool_ids], dtype=object
        )[tool_rows]

        # gaps (seconds): mostly short; ~7% > 30 min (session break); ~5% ties
        gaps = rng.exponential(45.0, size=length)
        u = rng.random(length)
        gaps[u < 0.07] = 1801.0 + rng.exponential(1200.0, size=int((u < 0.07).sum()))
        gaps[(u >= 0.07) & (u < 0.12)] = 0.0  # equal-ts ties (tie-break turn_idx)
        gaps[0] = 0.0
        start_off = float(rng.integers(0, 86_400 * 30))  # conv start within 30 days
        ts = BASE_TS + ((start_off + np.cumsum(gaps)) * 1e6).astype("timedelta64[us]")

        frames.append(
            pd.DataFrame(
                {
                    "conv_id": cid,
                    "turn_idx": t,
                    "role": roles,
                    "text": [text_for(cid, int(k)) for k in t],
                    "tool": tools,
                    "ts": ts,
                }
            )
        )

    df = pd.concat(frames, ignore_index=True)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def gen_conv_features(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Build-side table for the as-of join (FIXTURES.md §1 'as-of probes'):
    ``conv_features(conv_id, ts, feature_val)`` — cumulative user-turn count
    sampled at every third turn. Probe timestamps in the transcripts fall
    strictly between, exactly at, and before these feature timestamps,
    pinning the <= vs < semantics.
    """
    df = transcripts.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    cum = (
        (df["role"] == "user").astype("int64").groupby(df["conv_id"], sort=False).cumsum()
    )
    out = df.assign(feature_val=cum.astype("float64"))
    out = out[out["turn_idx"] % 3 == 0][["conv_id", "ts", "feature_val"]]
    # one feature row per (conv_id, ts): keep the last (matches as-of
    # tie-break 'latest build row wins')
    out = out.groupby(["conv_id", "ts"], as_index=False, sort=True).last()
    return out.reset_index(drop=True)


def write_parquet(df: pd.DataFrame, path: str, row_group_size: int = 100_000) -> None:
    """Small row groups on purpose: parquet scans parallelize at row-group
    granularity, and one giant row group serializes the whole scan stage
    (pyarrow's 1M-row default caps a 3M-row file at ~3 scan tasks)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        path,
        row_group_size=row_group_size,
    )
