"""Measure the EN rule engine's phoneme error rate against the lexicon.

The reference backs its English G2P with the full ~134k-entry CMUdict via
eng_to_ipa (/root/reference/openvoice/text/english.py:168-181); this repo
ships a ~4.5k lexicon plus an NRL-style rule engine for the long tail
(text/english.py).  This script quantifies the rule engine: for every
alphabetic lexicon entry, run the RULES ONLY on the spelling and score the
phoneme error rate (Levenshtein over phoneme tokens, stress stripped)
against the lexicon pronunciation.

The rules never consult the lexicon, so every entry is a held-out test
word for the rule path — the full lexicon is the evaluation set (larger
than the ~500-entry hold-out originally proposed).  Two honesty notes:
(a) the lexicon was curated TOWARD rule-hostile words (names, loanwords,
irregulars), so these numbers are a PESSIMISTIC bound for random English
text; (b) a minority of rules were written while inspecting lexicon
examples, which would bias the other way — class-level numbers (names vs
common words) bracket both effects.

Usage: python benchmarks/measure_g2p_per.py [--worst N]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def edit_distance(a: list[str], b: list[str]) -> int:
    if not a:
        return len(b)
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def length_class(word: str) -> str:
    n = len(word)
    return "len<=4" if n <= 4 else "len5-7" if n <= 7 else "len8-10" if n <= 10 else "len>10"


def origin_class(word: str) -> str:
    """Provenance tier from the lexicon's own authoring blocks: core
    frequency-ranked vocabulary vs external-prose harvest vs proper nouns/
    loanwords (en_lexicon.py::LEXICON_TIERS).  A word promoted across
    blocks keeps its FIRST tier (dict order of LEXICON_TIERS)."""
    from openvoice_tpu.text.en_lexicon import LEXICON_TIERS

    for tier, words in LEXICON_TIERS.items():
        if word in words:
            return f"tier:{tier}"
    return "tier:unknown"


def measure() -> dict:
    from openvoice_tpu.text.en_lexicon import LEXICON
    from openvoice_tpu.text.english import phoneme_tokens, word_to_ipa_rules

    per_class: dict[str, list] = collections.defaultdict(lambda: [0, 0, 0, 0])
    worst = []
    tot_e = tot_n = exact = words = 0
    for w, ref_ipa in sorted(LEXICON.items()):
        if not w.isalpha():
            continue  # apostrophe/diacritic entries are not rule-path words
        hyp = phoneme_tokens(word_to_ipa_rules(w))
        ref = phoneme_tokens(ref_ipa)
        e = edit_distance(hyp, ref)
        words += 1
        tot_e += e
        tot_n += len(ref)
        exact += e == 0
        for cls in (length_class(w), origin_class(w)):
            s = per_class[cls]
            s[0] += e
            s[1] += len(ref)
            s[2] += 1
            s[3] += e == 0
        worst.append((e / max(1, len(ref)), w, "".join(hyp), ref_ipa))
    worst.sort(reverse=True)
    return {
        "words": words,
        "per": tot_e / tot_n,
        "word_exact": exact / words,
        "classes": {
            cls: {"words": s[2], "per": s[0] / s[1], "word_exact": s[3] / s[2]}
            for cls, s in sorted(per_class.items())
        },
        "worst": worst,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worst", type=int, default=10, help="print N worst words")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    m = measure()
    if args.json:
        m.pop("worst")
        print(json.dumps(m))
        return
    print(f"rule-engine PER vs lexicon ({m['words']} held-out words)")
    print(f"  overall PER        {m['per']:.4f}")
    print(f"  word-exact rate    {m['word_exact']:.4f}")
    for cls, s in m["classes"].items():
        print(f"  {cls:14s} {s['words']:5d} words  PER {s['per']:.4f}  exact {s['word_exact']:.4f}")
    if args.worst:
        print(f"worst {args.worst}:")
        for r, w, h, p in m["worst"][: args.worst]:
            print(f"  {w:16s} rules={h:20s} ref={p:20s} per={r:.2f}")


if __name__ == "__main__":
    sys.exit(main())
