"""Deterministic synthetic transcript corpus (FIXTURES.md §1-§2).

Seed-fixed (seed=42), no wall-clock reads. Produces rows of exactly the
BASELINE.json input_hint shape:
  (conv_id string, turn_idx int32, role string, text string, tool string, ts timestamp)

Vocabulary w0001..w5000 + stop words, Zipf(s=1.1) term choice (high-DF head
exercises the salted-merge path), Poisson(λ=12)+1 turn lengths, 3% verbatim
repeats (tf>1 / duplicate-doc tie-break coverage), 0.5% empty turns (dl=0),
conversations of 2-50 turns, ts = epoch + global_row_index seconds.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"]
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["", "search", "bash", "browse", "calc"]


def make_transcripts(n_turns: int, seed: int = 42, vocab_size: int = 5000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array(STOPWORDS + [f"w{i:04d}" for i in range(1, vocab_size + 1)])

    # Zipf ranks over the vocabulary (s=1.1), stopwords get the head.
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()

    lengths = rng.poisson(12, n_turns) + 1
    empty = rng.random(n_turns) < 0.005
    lengths[empty] = 0

    total = int(lengths.sum())
    words = vocab[rng.choice(len(vocab), size=total, p=probs)]
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    texts = [" ".join(words[offsets[i]:offsets[i + 1]]) for i in range(n_turns)]

    # 3% verbatim repeats of an earlier turn
    rep = np.flatnonzero(rng.random(n_turns) < 0.03)
    for i in rep:
        if i > 0:
            texts[i] = texts[int(rng.integers(0, i))]

    # conversations of 2-50 turns
    conv_sizes = []
    acc = 0
    while acc < n_turns:
        s = int(rng.integers(2, 51))
        conv_sizes.append(min(s, n_turns - acc))
        acc += conv_sizes[-1]
    conv_ids = np.repeat(
        [f"conv-{i:07d}" for i in range(len(conv_sizes))], conv_sizes
    )
    turn_idx = np.concatenate([np.arange(s) for s in conv_sizes]).astype(np.int32)

    roles = np.array(ROLES)[rng.integers(0, len(ROLES), n_turns)]
    tools = np.where(
        roles == "tool",
        np.array(TOOLS[1:])[rng.integers(0, len(TOOLS) - 1, n_turns)],
        "",
    )
    ts = [EPOCH + dt.timedelta(seconds=int(i)) for i in range(n_turns)]

    return pd.DataFrame({
        "conv_id": conv_ids,
        "turn_idx": turn_idx,
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts,
    })


def fixture_corpus() -> pd.DataFrame:
    """The 6-turn micro-corpus of FIXTURES.md §2 (mirrors the reference's
    TestIndex 4-doc corpus, /root/reference/core/src/test/java/nl/inl/blacklab/
    testutil/TestIndex.java:101-140)."""
    rows = [
        (0, "user", "the quick brown fox jumps over the lazy dog"),
        (1, "assistant", "noot mier aap mier mier mier noot noot aap aap aap aap"),
        (2, "user", "may the force be with you may the force be with you"),
        (3, "assistant", "to be or not to be that is the question"),
        (4, "tool", ""),
        (5, "assistant", "the quick brown fox jumps over the lazy dog"),
    ]
    return pd.DataFrame({
        "conv_id": ["conv-fixture"] * len(rows),
        "turn_idx": np.array([r[0] for r in rows], dtype=np.int32),
        "role": [r[1] for r in rows],
        "text": [r[2] for r in rows],
        "tool": ["" for _ in rows],
        "ts": [EPOCH + dt.timedelta(seconds=i) for i in range(len(rows))],
    })
