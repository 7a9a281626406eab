"""Pairwise similarity kernels used inside the Stage-2 scoring UDF.

Plays the role of the reference's BERT cross-encoder + ranking features
(`/root/reference/qurator/sbb_ned/models/bert.py:307-326` softmax probas;
`index.py:692-703` match_uniqueness/coverage/dist) with deterministic,
model-free similarity families:

- token-set Jaccard        ~ match_coverage / match_uniqueness family
- skeleton sequence ratio  ~ pairwise BERT proba (structure agreement)
- trigram cosine           ~ summarized embedding distance (`dist`)
- size ratio               ~ len_guessed ranking feature

All kernels take numpy arrays (Arrow batch columns); the only per-element
Python is the difflib sequence match, bounded by ``max_seq`` tokens.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import numpy as np


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted unique int arrays via merge intersection."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (len(a) + len(b) - inter)


def containment_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """|A ∩ B| / min(|A|,|B|) — robust to truncation variants."""
    m = min(len(a), len(b))
    if m == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / m


def seq_ratio(a, b, max_seq: int = 400) -> float:
    """difflib ratio over (hashed) token sequences, length-capped."""
    a = list(a[:max_seq]) if a is not None else []
    b = list(b[:max_seq]) if b is not None else []
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return SequenceMatcher(None, a, b, autojunk=False).ratio()


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    if a is None or b is None or len(a) == 0 or len(b) == 0:
        return 0.0
    num = float(np.dot(a, b))
    den = float(np.linalg.norm(a) * np.linalg.norm(b))
    return num / den if den > 0 else 0.0


def size_ratio(na: int, nb: int) -> float:
    hi = max(na, nb)
    return (min(na, nb) / hi) if hi > 0 else 1.0


def combined_score(
    token_jaccard: float,
    token_containment: float,
    skeleton_ratio: float,
    trigram_cosine: float,
    size_r: float,
    w_token: float,
    w_skel: float,
    w_cos: float,
    w_size: float,
) -> float:
    """Deterministic blend in [0,1] — the analog of the decider's
    ``proba_1`` (`models/decider.py:229-258`), replacing the RandomForest
    with a fixed convex combination (north_star allows threshold rule).

    Token evidence uses max(jaccard, containment·jaccard-floor) so
    truncation variants aren't double-penalized."""
    token_ev = max(token_jaccard, 0.7 * token_containment + 0.3 * token_jaccard)
    return (
        w_token * token_ev
        + w_skel * skeleton_ratio
        + w_cos * trigram_cosine
        + w_size * size_r
    )
