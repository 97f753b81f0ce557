"""Pure functions reproducing the reference's computational semantics.

Submodules:
    textnorm   — clean_text v1 / normalize v2, URL/emoji handling, hashing
    extract    — regex entity extraction with char spans
    iob        — IOB2 repair / validation / tag cleaning / BIO decode
    canonical  — Ethiopic character folding, price/phone canonicalization
    conll      — CoNLL read/write for golden fixtures
"""
