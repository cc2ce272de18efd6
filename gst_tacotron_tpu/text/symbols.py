"""Character inventory (reference token dict; SURVEY.md §2.1 "Text frontend").

Index 0 is PAD (also the attention-masked id) and index 1 is EOS, matching the
keithito-lineage `_`/`~` specials. The inventory is ASCII letters, digits
(kept so un-expanded digits never crash), and the punctuation the English
cleaner can emit.
"""

from __future__ import annotations

PAD = "_"
EOS = "~"

_PUNCTUATION = "!'(),-.:;? "
_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_DIGITS = "0123456789"

SYMBOLS = [PAD, EOS] + list(_PUNCTUATION) + list(_LETTERS) + list(_DIGITS)

SYMBOL_TO_ID = {s: i for i, s in enumerate(SYMBOLS)}
ID_TO_SYMBOL = {i: s for i, s in enumerate(SYMBOLS)}

PAD_ID = SYMBOL_TO_ID[PAD]
EOS_ID = SYMBOL_TO_ID[EOS]

NUM_SYMBOLS = len(SYMBOLS)
