"""Deterministic model artifacts for the stateful stages.

Two tiny, dependency-free models (the container has no fastText/KenLM; per
the build brief these stand in for them with identical Ray-side plumbing —
actor-pool ``map_batches`` stages that load state once per actor):

- :class:`LangIdModel` — marker-word / script char n-gram language scorer
  (fastText-langid stand-in).  Fully vectorized per batch.
- :class:`PerplexityModel` — byte-bigram language model trained on an
  embedded deterministic English corpus (KenLM stand-in).  Scores a batch
  via one concatenated byte-array + ``np.add.reduceat`` — no per-row loop.

Both are pure functions of their constants, so the pandas oracle imports
the same classes (the model is shared configuration, like the pattern
banks; the oracle independently re-implements the *rule* logic only).

The actor-pool template follows the reference's fitted-model scoring shape
(fit once / score per row, outlier_detection_pack/main.py:201-260).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "to", "in", "is", "it", "that", "this",
           "while", "about", "over", "with", "every", "new", "things"),
    "fr": ("le", "la", "les", "des", "une", "et", "dans", "pour", "avec",
           "est", "sont", "nous", "vous", "merci", "toujours", "tres", "chez"),
    "de": ("der", "die", "das", "ein", "und", "ist", "nicht", "mit", "auf",
           "für", "von", "haben", "werden", "sehr", "aber", "noch", "über"),
}

_CJK_RANGE_RE = r"[一-鿿぀-ヿ가-힯]"


class LangIdModel:
    """Marker-word language identifier.

    ``predict_batch`` returns (lang, margin) per row where margin is the
    winner's score minus the runner-up's; rows with zero evidence get
    ("und", 0.0).  Scores are marker-hit counts normalized by token count
    (CJK: CJK-chars / chars).  All counting is RE2-vectorized.
    """

    def __init__(self) -> None:
        import re as _re
        self.patterns = {
            lang: r"(?i)\b(?:" + "|".join(_re.escape(w) for w in words) + r")\b"
            for lang, words in LANG_MARKERS.items()
        }
        self.langs = list(self.patterns) + ["cjk"]

    def predict_batch(self, text: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
        n_tok = pc.count_substring_regex(text, r"\S+").fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        n_chr = pc.utf8_length(text).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        denom_tok = np.maximum(n_tok, 1.0)
        scores = np.zeros((len(self.langs), len(n_tok)), dtype=np.float64)
        for i, lang in enumerate(self.patterns):
            hits = pc.count_substring_regex(text, self.patterns[lang]).fill_null(0)
            scores[i] = hits.to_numpy(zero_copy_only=False) / denom_tok
        cjk_hits = pc.count_substring_regex(text, _CJK_RANGE_RE).fill_null(0)
        scores[-1] = cjk_hits.to_numpy(zero_copy_only=False) / np.maximum(n_chr, 1.0)

        order = np.argsort(-scores, axis=0)
        best = order[0]
        second = order[1]
        idx = np.arange(scores.shape[1])
        margin = scores[best, idx] - scores[second, idx]
        langs_arr = np.array(self.langs, dtype=object)
        pred = langs_arr[best]
        pred[scores[best, idx] <= 0.0] = "und"
        return pred, margin


# ------------------------------------------------------------------ perplexity

def _training_corpus() -> bytes:
    """Deterministic English training text for the byte-bigram LM."""
    from packs_ray.gen import _EN_WORDS, _sentence_pool  # deterministic pools

    rng = np.random.default_rng(1234)
    pool = _sentence_pool(rng, 2000, _EN_WORDS, lo=6, hi=20)
    return (". ".join(pool)).encode("utf-8", errors="ignore")


def _utf8_buffers(text: pa.Array | pa.ChunkedArray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated utf-8 byte data, per-row offsets) — zero-copy reads
    of the Arrow string buffers; nulls read as empty."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    filled = pc.fill_null(text, "")
    if isinstance(filled, pa.ChunkedArray):
        filled = filled.combine_chunks()
    arr = filled.cast(pa.binary())
    raw_offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    offsets = raw_offsets[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data_buf = arr.buffers()[2]
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.zeros(0, dtype=np.uint8))
    return data, offsets


def bits_per_byte_from_logp(logp: np.ndarray,
                            text: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Mean negative bigram log2-prob per row under a (256, 256) logp
    table; 0.0 for rows with < 2 bytes."""
    data, offsets = _utf8_buffers(text)
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float64)
    if len(data) < 2:
        return out
    # bigram logp for every adjacent byte pair in the concatenated
    # data: ONE flat uint16 index (hi byte << 8 | lo byte) gathered
    # from the flattened table — no int64 casts, no 2-d fancy index
    idx = (data[:-1].astype(np.uint16) << np.uint16(8)) | data[1:]
    nlp = len(idx)
    lp = np.empty(nlp + 1, dtype=np.float64)  # +1 dummy slot: keeps the
    lp[-1] = 0.0                              # last reduceat end in range
    np.take(logp.ravel(), idx, out=lp[:-1])
    # per-row sums over [start, end) bigram spans via one reduceat pass
    # (pairs interleaved; the inter-pair gap segments land at odd slots
    # and are discarded) — replaces a full-length cumsum
    lens = offsets[1:] - offsets[:-1]
    valid = lens >= 2
    if not valid.any():
        return out
    starts = offsets[:-1][valid]
    ends = (offsets[1:][valid] - 1)
    pairs = np.empty(2 * len(starts), dtype=np.int64)
    pairs[0::2] = starts
    pairs[1::2] = ends
    sums = np.add.reduceat(lp, pairs)[0::2]
    # a row whose span ends at the very last bigram contributes the
    # dummy slot too when reduceat runs to the array end; subtract none
    # (dummy is 0.0), so sums are exact
    out[valid] = -sums / (lens[valid] - 1)
    return out


class PerplexityModel:
    """Byte-bigram LM; ``bits_per_byte`` ≈ cross-entropy of each row's
    UTF-8 bytes under an English bigram distribution (add-one smoothed).
    """

    def __init__(self) -> None:
        corpus = np.frombuffer(_training_corpus(), dtype=np.uint8)
        counts = np.ones((256, 256), dtype=np.float64)  # add-one smoothing
        np.add.at(counts, (corpus[:-1].astype(np.intp), corpus[1:].astype(np.intp)), 1.0)
        self.logp = np.log2(counts / counts.sum(axis=1, keepdims=True))

    def bits_per_byte(self, text: pa.Array | pa.ChunkedArray) -> np.ndarray:
        """Mean negative bigram log2-prob per row; 0.0 for rows with < 2
        bytes (null/empty/1-char rows are the other rules' business)."""
        return bits_per_byte_from_logp(self.logp, text)
