"""NER model-scorer stage — the central stateful actor pool (SURVEY.md §2.3 T2).

The reference loads an HF ``pipeline("ner")`` once per process and calls it
row-at-a-time (scorecard_engine.py:20-30, 54-57). Here the scorer is a
callable class for ``map_batches(NerScorer, concurrency=(min,max),
batch_size=B, num_cpus/num_gpus=...)``: model/tagger setup happens ONCE per
actor in ``__init__``; ``__call__`` runs a whole Arrow batch.

This container has no torch/transformers, so the default backend is a
deterministic rule-based tagger that exercises the full BIO path (tokenize →
tag → IOB2 repair per data_pipeline.py:101-136 → BIO decode → mentions).

``backend="mock_model"`` runs the REAL model-scoring dataflow — word-piece
tokenize → subword label alignment (functions/subword.py, reference
train_ner.py:252-303) → per-subword predictions → first-subword argmax
decode back to words (interpret.py:1023-1038) → IOB2 repair → mentions —
with a deterministic mock word-piece tokenizer and the rule tagger standing
in for the forward pass. ``backend="transformers"`` is the same path with a
real HF tokenizer/model; only its model load raises NotImplementedError in
this torch-less container.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.canonical import canon_phone, canon_price, canon_text
from ..functions.extract import DEFAULT_LOCATIONS, build_loc_pattern, extract_mentions
from ..functions.iob import bio_decode, fix_entity_tags
from ..functions.textnorm import tokenize
from ..schemas import MENTION_TYPE


class TinyTransformerForward:
    """CPU-only numpy stand-in for the transformer forward pass: hashed
    piece embeddings → one single-head self-attention block (residual) →
    GELU MLP → classifier head, emitting real float32 logits per subword.

    The network term is scale-bounded and a teacher-bias term
    (``margin`` × one-hot of the rule-derived label) dominates it, so the
    argmax reproduces the rule tagger exactly — ``kg_triples_ner_subword``
    stays byte-identical — while everything downstream of the forward pass
    (argmax → first-subword decode → repair → mentions) consumes genuine
    floating-point logits, not rule-derived ids. A real transformers
    backend swaps ONLY this class for AutoModelForTokenClassification."""

    def __init__(
        self,
        n_labels: int,
        dim: int = 32,
        hidden: int = 64,
        vocab: int = 1024,
        margin: float = 4.0,
        seed: int = 0,
    ):
        import numpy as np

        rng = np.random.RandomState(seed)
        s = 1.0 / np.sqrt(dim)
        self.emb = rng.normal(0, 1, (vocab, dim)).astype(np.float32)
        self.wq = rng.normal(0, s, (dim, dim)).astype(np.float32)
        self.wk = rng.normal(0, s, (dim, dim)).astype(np.float32)
        self.wv = rng.normal(0, s, (dim, dim)).astype(np.float32)
        self.w1 = rng.normal(0, s, (dim, hidden)).astype(np.float32)
        self.b1 = np.zeros(hidden, dtype=np.float32)
        self.w2 = rng.normal(0, 1.0 / np.sqrt(hidden), (hidden, n_labels)).astype(np.float32)
        self.b2 = np.zeros(n_labels, dtype=np.float32)
        self.vocab = vocab
        self.margin = margin
        self.n_labels = n_labels

    def _piece_ids(self, pieces: list[str]):
        import hashlib

        import numpy as np

        return np.array(
            [
                int.from_bytes(hashlib.blake2b(p.encode("utf-8"), digest_size=4).digest(), "big")
                % self.vocab
                for p in pieces
            ],
            dtype=np.int64,
        )

    def logits(self, pieces: list[str], teacher_ids: list[int]):
        import numpy as np

        x = self.emb[self._piece_ids(pieces)]  # (n, d)
        q, k, v = x @ self.wq, x @ self.wk, x @ self.wv
        att = q @ k.T / np.float32(np.sqrt(x.shape[1]))
        att = att - att.max(axis=1, keepdims=True)
        att = np.exp(att)
        att /= att.sum(axis=1, keepdims=True)
        h = x + att @ v  # residual single-head attention
        g = h @ self.w1 + self.b1
        g = g * 0.5 * (1.0 + np.tanh(0.7978845608 * (g + 0.044715 * g**3)))  # GELU
        out = g @ self.w2 + self.b2  # (n, L)
        # bound the network term strictly under margin/2, then add the
        # teacher bias: argmax == teacher id, logits stay real floats
        peak = max(1.0, float(np.abs(out).max()))
        out = out / peak * (self.margin / 4.0)
        out[np.arange(len(teacher_ids)), teacher_ids] += self.margin
        return out.astype(np.float32)


class NerScorer:
    """BIO token-classification scorer emitting the mentions schema.

    Output is schema-compatible with RegexExtractor so pipelines can swap
    extractor="regex" ↔ extractor="ner" without downstream changes.
    """

    def __init__(
        self,
        backend: str = "rules",
        model_path: str | None = None,
        locations: tuple[str, ...] = DEFAULT_LOCATIONS,
    ):
        self.backend = backend
        self._loc_pattern = build_loc_pattern(locations)
        if backend == "transformers":
            # The full scoring path (_model_tag_sentence: subword align →
            # forward → first-subword decode) is implemented and tested via
            # backend="mock_model"; ONLY the tokenizer/model load below is
            # the environment-gated stub.
            try:
                import transformers  # noqa: F401
            except ImportError as e:  # pragma: no cover - no torch in container
                raise NotImplementedError(
                    "transformers backend requires torch/transformers; "
                    "this environment ships neither. Use backend='rules' or "
                    "'mock_model' (same dataflow, stand-in forward pass)."
                ) from e
            raise NotImplementedError(  # pragma: no cover
                "wire AutoTokenizer/AutoModelForTokenClassification here; "
                "everything around the forward pass is _model_tag_sentence"
            )
        elif backend == "mock_model":
            from ..functions.subword import MockWordPieceTokenizer

            self._tokenizer = MockWordPieceTokenizer(piece_len=4)
        elif backend == "tiny_transformer":
            from ..functions.subword import LABEL2ID, MockWordPieceTokenizer

            self._tokenizer = MockWordPieceTokenizer(piece_len=4)
            # weights built ONCE per actor (the model-load slot)
            self._net = TinyTransformerForward(n_labels=len(LABEL2ID))
        elif backend != "rules":
            raise ValueError(f"unknown backend {backend!r}")

    # -- rule backend -------------------------------------------------------

    def _tag_sentence(self, clean_text: str) -> tuple[list[str], list[str]]:
        """Whitespace-tokenize and BIO-tag via the deterministic extractor:
        tokens covered by a mention span get B-/I- of its type."""
        tokens = tokenize(clean_text)
        tags = ["O"] * len(tokens)
        if not tokens:
            return tokens, tags
        # token char offsets (clean_text is whitespace-collapsed upstream,
        # but recompute real offsets to be safe)
        offsets = []
        pos = 0
        for tok in tokens:
            start = clean_text.index(tok, pos)
            offsets.append((start, start + len(tok)))
            pos = start + len(tok)
        spans = extract_mentions(clean_text, None)  # LOC handled separately below
        for m in spans:
            first = True
            for i, (s, e) in enumerate(offsets):
                if s < m["end"] and e > m["start"]:
                    tags[i] = ("B-" if first else "I-") + m["etype"]
                    first = False
        # LOC from gazetteer on folded tokens
        folded = [canon_text(t) for t in tokens]
        i = 0
        while i < len(tokens):
            matched = 0
            for ln in (3, 2, 1):
                if i + ln <= len(tokens):
                    cand = " ".join(folded[i : i + ln])
                    if self._loc_pattern.fullmatch(cand) and all(
                        t == "O" for t in tags[i : i + ln]
                    ):
                        tags[i] = "B-LOC"
                        for j in range(i + 1, i + ln):
                            tags[j] = "I-LOC"
                        matched = ln
                        break
            i += matched or 1
        return tokens, tags

    def _decode(self, tokens: list[str], tags: list[str]) -> list[dict]:
        from ..functions.textnorm import PRICE_RE_V1

        mentions = []
        for span in bio_decode(tokens, tags):
            etype, surface = span["etype"], span["surface"]
            if etype == "PRICE":
                # same amount-capture as the regex path (incl. its partial-
                # match quirk on ungrouped numbers) so extractor="ner" is
                # swap-compatible; an unanchored \d{1,3} search would
                # fabricate digit prefixes like "250" from "2500 ብር"
                m = PRICE_RE_V1.search(surface + " ብር")
                norm = canon_price(m.group(1)) if m else None
                if norm is None:
                    continue
            elif etype == "PHONE":
                norm = canon_phone(surface)
            elif etype == "PRODUCT":
                # head-phrase product key, matching functions/extract.py
                norm = canon_text(" ".join(surface.split()[:4]))
            else:
                norm = canon_text(surface)
            mentions.append(
                {
                    "etype": etype,
                    "surface": surface,
                    "norm": norm,
                    "start": span["tok_start"],  # token-space spans for BIO path
                    "end": span["tok_end"],
                    "entity_id": -1,
                }
            )
        return mentions

    # -- model backend (mock_model / transformers) --------------------------

    def _subword_logits_argmax(self, word_ids: list, words: list[str], pieces: list[str] | None = None) -> list[int]:
        """Stand-in forward pass: per-subword predicted label ids. A real
        backend replaces this with argmax over model logits. ``mock_model``
        derives ids from the rule tagger through the SAME training-side
        alignment; ``tiny_transformer`` runs those ids through a real numpy
        attention+MLP forward and takes argmax over FLOAT LOGITS, so the
        logits→argmax decode path is exercised end-to-end."""
        from ..functions.subword import IGNORE_INDEX, LABEL2ID, align_labels_with_subwords

        _, word_tags = self._tag_words(words)
        aligned = align_labels_with_subwords(word_ids, word_tags)
        o_id = LABEL2ID["O"]
        # a real model emits a label for EVERY subword position
        teacher = [o_id if i == IGNORE_INDEX else i for i in aligned]
        if self.backend == "tiny_transformer":
            return self._net.logits(pieces, teacher).argmax(axis=1).tolist()
        return teacher

    def _tag_words(self, words: list[str]) -> tuple[list[str], list[str]]:
        return self._tag_sentence(" ".join(words)) if words else (words, [])

    def _model_tag_sentence(self, clean_text: str) -> tuple[list[str], list[str]]:
        """Word-piece tokenize → subword predictions → first-subword decode
        (reference interpret.py:1023-1038). Shared by mock_model and a real
        transformers backend — only _subword_logits_argmax differs."""
        from ..functions.subword import align_predictions_to_words

        words = tokenize(clean_text)
        if not words:
            return words, []
        enc = self._tokenizer(words)
        pred_ids = self._subword_logits_argmax(enc["word_ids"], words, enc["tokens"])
        tags = align_predictions_to_words(enc["word_ids"], pred_ids)
        # truncation can drop trailing words: pad their tags with O so the
        # repair/decode contract (len(tags) == len(words)) holds
        if len(tags) < len(words):
            tags = tags + ["O"] * (len(words) - len(tags))
        return words, tags

    def __call__(self, batch: pa.Table) -> pa.Table:
        tagger = self._tag_sentence if self.backend == "rules" else self._model_tag_sentence
        all_mentions = []
        for text in batch.column("clean_text").to_pylist():
            tokens, tags = tagger(text)
            tags = fix_entity_tags(tokens, tags)
            all_mentions.append(self._decode(tokens, tags))
        col = pa.array(all_mentions, pa.list_(MENTION_TYPE))
        return batch.append_column("mentions", col)


class MockModelNerScorer(NerScorer):
    """``NerScorer(backend="mock_model")`` as a zero-arg callable class, so
    pipelines can pass it straight to ``map_batches`` — the full
    subword-alignment scoring dataflow with rule-derived ids."""

    def __init__(self, **kw):
        super().__init__(backend="mock_model", **kw)


class TinyTransformerNerScorer(NerScorer):
    """``NerScorer(backend="tiny_transformer")`` as a zero-arg callable
    class (extractor="ner_subword" in pipelines/kg.py): the full model
    dataflow INCLUDING a numpy forward pass producing float logits —
    weights are built once per actor in ``__init__``, the model-load
    slot a real transformers backend fills."""

    def __init__(self, **kw):
        super().__init__(backend="tiny_transformer", **kw)
