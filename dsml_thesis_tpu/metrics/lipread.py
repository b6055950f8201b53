"""Lip-reading evaluation utilities: WER / CER / viseme-level rates.

Parity target: talking_face/run_av_hubert.py:34-145 + utils/lipread_utils.py +
data/phonemes2visemes.csv — hypothesis transcripts (from an external AV-HuBERT
inference) are scored against MEAD ground-truth sentences at word, character,
and viseme level. The phoneme→viseme table follows the Amazon Polly viseme
set used by the reference's CSV.

Pure Python (edit distance) — no torch/fairseq needed for scoring. The
phonemization of words uses `phonemizer` when installed; otherwise
viseme metrics require pre-phonemized input.
"""
from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

# ARPABET-style phoneme -> Amazon Polly viseme classes
PHONEME2VISEME = {
    "b": "p", "m": "p", "p": "p",
    "d": "t", "dh": "t", "n": "t", "t": "t", "th": "t",
    "f": "f", "v": "f",
    "g": "k", "hh": "k", "k": "k", "ng": "k",
    "ch": "S", "jh": "S", "sh": "S", "zh": "S",
    "s": "s", "z": "s",
    "l": "t", "el": "t",
    "r": "r", "er": "E", "w": "u", "y": "i",
    "aa": "a", "ae": "a", "ah": "E", "ao": "O", "aw": "a", "ay": "a",
    "eh": "E", "ey": "e", "ih": "i", "iy": "i",
    "ow": "o", "oy": "O", "uh": "u", "uw": "u",
    "sil": "sil", "sp": "sil",
}


def _strip_stress(ph: str) -> str:
    return "".join(c for c in ph if not c.isdigit()).lower()


def phonemes_to_visemes(phonemes: Iterable[str]) -> List[str]:
    out = []
    for ph in phonemes:
        v = PHONEME2VISEME.get(_strip_stress(ph))
        if v is not None and v != "sil":
            out.append(v)
    return out


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance (iterative DP, O(len(ref) * len(hyp)))."""
    m, n = len(ref), len(hyp)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[n]


def error_rate(refs: Sequence[Sequence], hyps: Sequence[Sequence]) -> float:
    """Corpus-level rate: sum(edit distances) / sum(ref lengths).

    Uses the native C++ batch kernel (native/editdist.cc) when available;
    falls back to the pure-Python DP."""
    assert len(refs) == len(hyps)
    from .native import edit_distance_batch

    dists = edit_distance_batch([list(r) for r in refs], [list(h) for h in hyps])
    if dists is not None:
        total_err = int(dists.sum())
    else:
        total_err = sum(edit_distance(r, h) for r, h in zip(refs, hyps))
    total_len = sum(len(r) for r in refs)
    return total_err / max(total_len, 1)


def wer(ref_texts: Sequence[str], hyp_texts: Sequence[str]) -> float:
    return error_rate(
        [t.lower().split() for t in ref_texts],
        [t.lower().split() for t in hyp_texts],
    )


def cer(ref_texts: Sequence[str], hyp_texts: Sequence[str]) -> float:
    return error_rate(
        [list(t.lower().replace(" ", "")) for t in ref_texts],
        [list(t.lower().replace(" ", "")) for t in hyp_texts],
    )


def text_to_visemes(text: str) -> List[str]:
    """Phonemize (espeak backend via `phonemizer`) then map to visemes."""
    try:
        from phonemizer import phonemize
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "viseme metrics on raw text need the optional `phonemizer` package; "
            "pass pre-phonemized sequences to viseme_error_rate instead"
        ) from e
    ph = phonemize(text, backend="espeak", strip=True).split()
    return phonemes_to_visemes(ph)


def viseme_error_rate(
    ref_phonemes: Sequence[Sequence[str]], hyp_phonemes: Sequence[Sequence[str]]
) -> float:
    return error_rate(
        [phonemes_to_visemes(p) for p in ref_phonemes],
        [phonemes_to_visemes(p) for p in hyp_phonemes],
    )
