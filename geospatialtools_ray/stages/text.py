"""Text analysis stages: language ID, quality scoring, token counting,
document fingerprinting. Stateful pieces (compiled regexes, n-gram profile
tables) live in callable-class actors (`__init__` once per actor)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import splitmix64, text_hash_u64

# tiny character-trigram profiles per language (public-knowledge heuristic:
# frequent function-word fragments; good enough for a deterministic n-gram
# language-ID stage — the engine contract is the plumbing, not SOTA LID)
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "of ", "to ", " th", "he "],
    "de": ["der", "die", "und", "ein", "sch", "ich", "en ", "ch "],
    "fr": ["le ", "de ", "les", "ent", "que", "ais", "ion", " de"],
    "es": ["de ", "la ", "que", "el ", "los", "ión", "ado", " de"],
    "zh": [],  # CJK detected by codepoint range instead
}


class LangId:
    """Actor-pool language ID: n-gram profile hits + CJK codepoint ratio.
    Use with ds.map_batches(LangId, concurrency=N, batch_format="pandas")."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}
        self.cjk = re.compile(r"[一-鿿㐀-䶿]")

    def _score_one(self, t: str) -> str:
        if not t:
            return "unknown"
        if len(self.cjk.findall(t)) / max(len(t), 1) > 0.2:
            return "zh"
        tl = t.lower()
        best, best_n = "unknown", 0
        for lang, grams in self.profiles.items():
            n = sum(tl.count(g) for g in grams)
            if n > best_n:
                best, best_n = lang, n
        return best if best_n > 0 else "unknown"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out_col] = [self._score_one(t) for t in batch[self.text_col]]
        return batch


class QualityScore:
    """Actor-pool quality scoring: length / punctuation / stopword /
    repetition heuristics (C4/Gopher-style filters, public recipes)."""

    STOPWORDS = frozenset("the of and to in a is that for on with as by at from it this be are was".split())

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[A-Za-z']+")
        self.punct_re = re.compile(r"[.,;:!?]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col]
        n_chars = texts.str.len().to_numpy()
        words = [self.word_re.findall(t.lower()) for t in texts]
        n_words = np.asarray([len(w) for w in words])
        mean_wlen = np.asarray([np.mean([len(x) for x in w]) if w else 0.0 for w in words])
        stop_ratio = np.asarray(
            [sum(1 for x in w if x in self.STOPWORDS) / max(len(w), 1) for w in words]
        )
        n_punct = np.asarray([len(self.punct_re.findall(t)) for t in texts])
        uniq_ratio = np.asarray([len(set(w)) / max(len(w), 1) for w in words])
        batch = batch.assign(
            n_chars_q=n_chars,
            n_words=n_words,
            mean_word_len=mean_wlen,
            stopword_ratio=stop_ratio,
            punct_per_word=n_punct / np.maximum(n_words, 1),
            unique_word_ratio=uniq_ratio,
        )
        batch["quality_ok"] = (
            (n_words >= 3)
            & (mean_wlen >= 2)
            & (mean_wlen <= 12)
            & (uniq_ratio >= 0.2)
        )
        return batch


def token_count_stage(text_col: str = "text", out_col: str = "n_tokens"):
    """Whitespace + BPE-ish token counting, vectorized via Arrow kernels:
    word tokens plus standalone punctuation/digit runs."""

    def apply(batch: pa.Table) -> pa.Table:
        # RE2 (no lookahead): count token matches — word runs OR single
        # non-space punctuation — rather than splitting
        toks = pc.count_substring_regex(batch[text_col], r"[A-Za-z0-9']+|[^\sA-Za-z0-9]").cast(pa.int64())
        return batch.append_column(out_col, toks)

    return apply


def fingerprint_stage(text_col: str = "text", window: int = 8, out_col: str = "fingerprint"):
    """Winnowing-style document fingerprint (Schleimer et al. 2003): min
    rolling-window hash of word 4-grams, xor-folded — one stable uint64
    per doc, robust to small edits."""

    def apply(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            words = t.split()
            grams = [" ".join(words[j : j + 4]) for j in range(max(len(words) - 3, 1))]
            h = text_hash_u64(grams)
            if len(h) >= window:
                mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
            else:
                mins = h
            acc = np.uint64(0)
            with np.errstate(over="ignore"):
                for m in np.unique(mins):
                    acc ^= splitmix64(m)
            out[i] = acc
        return batch.append_column(out_col, pa.array(out, type=pa.uint64()))

    return apply
