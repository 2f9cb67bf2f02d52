"""Cleaners: language-tagged text → IPA (reference: text/cleaners.py).

`cjke_cleaners2` dispatches [ZH]/[EN] spans.  The reference also references
[JA]/[KO] handlers that were never imported/defined (text/cleaners.py:9,11 —
a latent NameError), so V1 effectively supports EN and ZH only; we scope
JA/KO out explicitly with a clear error instead of crashing mid-regex.
"""

from __future__ import annotations

import re

from openvoice_tpu.text.english import english_to_ipa2
from openvoice_tpu.text.mandarin import chinese_to_ipa


def _unsupported(lang: str):
    def handler(m: re.Match) -> str:
        raise NotImplementedError(
            f"[{lang}] spans are not supported by the V1 frontend (the reference "
            f"has the same gap — its {lang} cleaner is referenced but undefined); "
            "use the V2 path with an external base TTS for this language"
        )

    return handler


def cjke_cleaners2(text: str) -> str:
    text = re.sub(r"\[ZH\](.*?)\[ZH\]", lambda m: chinese_to_ipa(m.group(1)) + " ", text)
    text = re.sub(r"\[JA\](.*?)\[JA\]", _unsupported("JA"), text)
    text = re.sub(r"\[KO\](.*?)\[KO\]", _unsupported("KO"), text)
    text = re.sub(r"\[EN\](.*?)\[EN\]", lambda m: english_to_ipa2(m.group(1)) + " ", text)
    text = re.sub(r"\s+$", "", text)
    text = re.sub(r"([^\.,!\?\-…~])$", r"\1.", text)
    return text
