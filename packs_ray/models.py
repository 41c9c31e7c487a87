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


# ------------------------------------------------- real-model seam (gated)
#
# The north star names fastText langid and KenLM perplexity explicitly.
# This container ships neither the libraries nor downloadable artifacts,
# so the stages default to the deterministic stand-ins above — but the
# seam below accepts REAL model artifacts when they exist (the dbt-gate
# convention, functions/dbt_adapter.py: probe availability, fail with an
# actionable message, identical call surface either way):
#
# - ``ArpaLM`` loads any KenLM-format ARPA n-gram file (the public
#   textual format `kenlm` itself trains to) with a pure-Python parser
#   + standard backoff query — usable HERE, today, with a locally-built
#   .arpa; it also probes for the `kenlm` C library and uses it when
#   importable (bit-identical scores, far faster).
# - ``FastTextLangId`` wraps a real fastText ``.bin``/``.ftz`` behind an
#   import probe of the `fasttext` library (the .bin format is only
#   readable through it).
#
# ``load_langid_model`` / ``load_perplexity_model`` are the single
# dispatch points the stages call: explicit path argument first, then
# the PACKS_RAY_FASTTEXT_BIN / PACKS_RAY_KENLM_ARPA environment probes,
# then the stand-in.  Paths (not model objects) ride in
# ``fn_constructor_kwargs`` so every actor loads its own copy once.


class ArpaLM:
    """Word n-gram language model read from a KenLM/SRILM ARPA file.

    Standard backoff query (Katz/interpolated — the ARPA file already
    encodes whichever the trainer used): ``p(w|h)`` is the stored
    n-gram log10-prob when present, else ``backoff(h) + p(w|h[1:])``;
    words outside the vocabulary score as ``<unk>`` when the model has
    one, else a floor of -7 log10 (KenLM convention is always-has-unk).
    Sentences are scored as ``<s> w1 .. wn </s>`` like ``kenlm``'s
    ``score(text, bos=True, eos=True)``.

    The pure-Python query loop is the correctness seam, not the scale
    path: with the `kenlm` package importable the class delegates to it
    (same file, same scores); at 10^12-turn scale you would always
    install the C library on the workers.  Either way the model loads
    ONCE per actor (stage ``__init__``) and the artifact itself stays
    on shared storage."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._kenlm = None
        try:                                    # availability probe
            import kenlm                        # type: ignore

            self._kenlm = kenlm.Model(path)
            self.order = self._kenlm.order
            return
        except ImportError:
            pass
        self.logp: dict[tuple[str, ...], float] = {}
        self.backoff: dict[tuple[str, ...], float] = {}
        self.order = 0
        section = 0
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("\\data\\"):
                    continue
                if line.startswith("\\end\\"):
                    break
                if line.startswith("\\") and line.endswith("-grams:"):
                    section = int(line[1:line.index("-")])
                    self.order = max(self.order, section)
                    continue
                if section == 0:
                    continue                    # "ngram N=count" headers
                parts = line.split()    # tabs or spaces; words are
                # always space-separated within the n-gram field
                if len(parts) < section + 1:
                    continue
                lp = float(parts[0])
                words = tuple(parts[1:1 + section])
                self.logp[words] = lp
                if len(parts) > section + 1:
                    self.backoff[words] = float(parts[section + 1])
        self.vocab = {w[0] for w in self.logp if len(w) == 1}
        self.unk_logp = self.logp.get(("<unk>",), -7.0)

    def _prob(self, context: tuple[str, ...], w: str) -> float:
        """log10 p(w | context) with standard backoff recursion:
        stored n-gram if present, else backoff(context) + shorter."""
        ng = context + (w,)
        if ng in self.logp:
            return self.logp[ng]
        if not context:
            return self.unk_logp
        return self.backoff.get(context, 0.0) + self._prob(context[1:], w)

    def score(self, sentence: str) -> float:
        """Total log10 prob of the sentence with <s>/</s> like kenlm."""
        if self._kenlm is not None:
            return float(self._kenlm.score(sentence, bos=True, eos=True))
        toks = ["<s>"] + [t if t in self.vocab else "<unk>"
                          for t in sentence.split()] + ["</s>"]
        total = 0.0
        for i in range(1, len(toks)):
            ctx = tuple(toks[max(0, i - self.order + 1):i])
            total += self._prob(ctx, toks[i])
        return total

    def bits_per_byte(self, text: pa.Array | pa.ChunkedArray) -> np.ndarray:
        """Same contract as ``PerplexityModel.bits_per_byte``: mean
        negative log2-prob per UTF-8 byte; 0.0 for empty/null rows."""
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        vals = pc.fill_null(text, "").to_pylist()
        out = np.zeros(len(vals), dtype=np.float64)
        log2_10 = np.log2(10.0)
        for i, v in enumerate(vals):
            nb = len(v.encode("utf-8"))
            if nb == 0:
                continue
            out[i] = -self.score(v) * log2_10 / nb
        return out


class FastTextLangId:
    """Real fastText language-ID model behind an import probe: the
    ``.bin``/``.ftz`` container is only readable through the `fasttext`
    library, so construction raises an actionable error where the
    library is absent (this sandbox) and otherwise exposes the exact
    ``predict_batch`` surface of the stand-in ``LangIdModel`` — the
    stage code is identical either way."""

    def __init__(self, path: str) -> None:
        try:
            import fasttext                    # type: ignore
        except ImportError as e:
            raise RuntimeError(
                "fasttext library not importable — install `fasttext` on "
                "the workers (or leave PACKS_RAY_FASTTEXT_BIN unset to use "
                "the deterministic stand-in LangIdModel)") from e
        self.model = fasttext.load_model(path)

    def predict_batch(self, text: pa.Array | pa.ChunkedArray
                      ) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        vals = [v.replace("\n", " ")
                for v in pc.fill_null(text, "").to_pylist()]
        labels, probs = self.model.predict(vals, k=2)
        pred = np.array([(ls[0].replace("__label__", "") if ls else "und")
                         for ls in labels], dtype=object)
        margin = np.array([(ps[0] - ps[1]) if len(ps) > 1
                           else (ps[0] if len(ps) else 0.0)
                           for ps in probs], dtype=np.float64)
        return pred, margin


def load_langid_model(path: str | None = None):
    """Dispatch: explicit path > PACKS_RAY_FASTTEXT_BIN env > stand-in."""
    import os

    path = path or os.environ.get("PACKS_RAY_FASTTEXT_BIN")
    return FastTextLangId(path) if path else LangIdModel()


def load_perplexity_model(path: str | None = None):
    """Dispatch: explicit path > PACKS_RAY_KENLM_ARPA env > stand-in."""
    import os

    path = path or os.environ.get("PACKS_RAY_KENLM_ARPA")
    return ArpaLM(path) if path else PerplexityModel()
