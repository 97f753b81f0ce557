"""Property-based tests (hypothesis) for the pure kernels — the invariants
that must hold for EVERY input, not just fixtures: IOB2 repair/validate
laws, BIO decode/align round-trips, canonicalization idempotence, rounding
parity with DuckDB, salted/bucketed hashing determinism."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ethiomart_amharic_ner_ray.functions.canonical import canon_text, fold_ethiopic
from ethiomart_amharic_ner_ray.functions.iob import (
    bio_decode,
    fix_entity_tags,
    validate_sentence,
)
from ethiomart_amharic_ner_ray.functions.subword import (
    IGNORE_INDEX,
    LABEL2ID,
    MockWordPieceTokenizer,
    align_labels_with_subwords,
    align_predictions_to_words,
)
from ethiomart_amharic_ner_ray.pipelines.common import round_away
from ethiomart_amharic_ner_ray.schemas import BIO_LABELS

tags_strategy = st.lists(st.sampled_from(BIO_LABELS), min_size=0, max_size=24)
tokens_for = lambda tags: [f"w{i}" for i in range(len(tags))]  # noqa: E731

words_strategy = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x24F),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=16,
)

mixed_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd", "Po", "Zs", "Lo"),
        min_codepoint=0x20,
        max_codepoint=0x137F,
    ),
    max_size=80,
)


class TestIobLaws:
    @given(tags=tags_strategy)
    @settings(max_examples=200, deadline=None)
    def test_repair_output_always_validates(self, tags):
        """fix_entity_tags must produce a sentence the strict validator
        accepts UNLESS the input contains a B-after-I pattern (which repair
        intentionally preserves — reference rule set has no rule for it)."""
        tokens = tokens_for(tags)
        fixed = fix_entity_tags(tokens, tags)
        # rule 3 guarantees: no orphan I- anywhere
        prev = None
        for t in fixed:
            if t.startswith("I-"):
                assert prev is not None and prev[2:] == t[2:] and prev[0] in "BI"
            prev = t

    @given(tags=tags_strategy)
    @settings(max_examples=200, deadline=None)
    def test_repair_idempotent(self, tags):
        tokens = tokens_for(tags)
        once = fix_entity_tags(tokens, tags)
        assert fix_entity_tags(tokens, once) == once

    @given(tags=tags_strategy)
    @settings(max_examples=200, deadline=None)
    def test_decode_spans_partition_tagged_tokens(self, tags):
        """bio_decode spans are disjoint, ordered, in-range, and cover
        exactly the non-O positions of a repaired sentence."""
        tokens = tokens_for(tags)
        fixed = fix_entity_tags(tokens, tags)
        spans = bio_decode(tokens, fixed)
        covered = set()
        last_end = 0
        for s in spans:
            assert 0 <= s["tok_start"] < s["tok_end"] <= len(tokens)
            assert s["tok_start"] >= last_end
            last_end = s["tok_end"]
            covered |= set(range(s["tok_start"], s["tok_end"]))
        assert covered == {i for i, t in enumerate(fixed) if t != "O"}

    @given(tags=tags_strategy)
    @settings(max_examples=100, deadline=None)
    def test_validate_accepts_canonical_sequences(self, tags):
        tokens = tokens_for(tags)
        fixed = fix_entity_tags(tokens, tags)
        if validate_sentence(tokens, fixed):
            # validated sentences decode and re-encode consistently
            spans = bio_decode(tokens, fixed)
            rebuilt = ["O"] * len(tokens)
            for s in spans:
                rebuilt[s["tok_start"]] = "B-" + s["etype"]
                for i in range(s["tok_start"] + 1, s["tok_end"]):
                    rebuilt[i] = "I-" + s["etype"]
            # canonical IOB2 differs from fixed only where fixed used
            # B- continuation of same type (both valid encodings)
            assert [t[2:] if t != "O" else "O" for t in rebuilt] == [
                t[2:] if t != "O" else "O" for t in fixed
            ]


class TestSubwordLaws:
    @given(words=words_strategy, data=st.data())
    @settings(max_examples=150, deadline=None)
    def test_align_roundtrip_for_any_valid_tagging(self, words, data):
        tags = data.draw(
            st.lists(st.sampled_from(BIO_LABELS), min_size=len(words), max_size=len(words))
        )
        enc = MockWordPieceTokenizer(piece_len=3)(words)
        lab = align_labels_with_subwords(enc["word_ids"], tags)
        assert len(lab) == len(enc["word_ids"])
        preds = [LABEL2ID["O"] if i == IGNORE_INDEX else i for i in lab]
        assert align_predictions_to_words(enc["word_ids"], preds) == tags


class TestCanonicalLaws:
    @given(text=mixed_text)
    @settings(max_examples=300, deadline=None)
    def test_fold_idempotent_and_length_preserving(self, text):
        once = fold_ethiopic(text)
        assert fold_ethiopic(once) == once
        assert len(once) == len(text)  # 1:1 — spans stay valid

    @given(text=mixed_text)
    @settings(max_examples=200, deadline=None)
    def test_canon_text_idempotent(self, text):
        assert canon_text(canon_text(text)) == canon_text(text)


class TestRoundingParity:
    @given(
        x=st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        )
    )
    @settings(max_examples=300, deadline=None)
    def test_round_away_matches_duckdb(self, x):
        con = duckdb.connect()
        want = con.sql("SELECT round(CAST(? AS DOUBLE), 4)", params=[x]).fetchone()[0]
        assert round_away(x, 4) == want


class TestHashDeterminism:
    """Targets the ENGINE's key hash (common.stable_hash64) — the one every
    bucketed shuffle, shingle id, sketch, and node id goes through.
    pd.util.hash_pandas_object failed exactly this property: its
    object-dtype path hashes strings as null-terminated C strings with an
    array-wide fallback, so ['', '\\x00'] hashed differently together vs
    split across blocks (hypothesis found it; now a pinned regression)."""

    @given(keys=st.lists(st.text(max_size=20), min_size=1, max_size=50))
    @settings(max_examples=100, deadline=None)
    def test_bucket_hash_stable_across_block_splits(self, keys):
        """The bucket id of a key must not depend on which block it arrives
        in — co-location across tasks hangs on this. Alphabet includes
        control chars and embedded NULs via st.text's full unicode."""
        import pandas as pd

        from ethiomart_amharic_ner_ray.pipelines.common import stable_hash64

        full = stable_hash64(pd.DataFrame({"k": pd.Series(keys, dtype=object)}))
        cut = len(keys) // 2
        half = np.concatenate(
            [
                stable_hash64(pd.DataFrame({"k": pd.Series(keys[:cut], dtype=object)}))
                if cut
                else np.empty(0, np.uint64),
                stable_hash64(pd.DataFrame({"k": pd.Series(keys[cut:], dtype=object)})),
            ]
        )
        assert (full == half).all()

    def test_nul_byte_regression(self):
        """Pinned: the exact case where pandas' hasher broke (NUL-bearing
        strings hash context-dependently). '' and '\\x00' must hash stably
        AND differently."""
        import pandas as pd

        from ethiomart_amharic_ner_ray.pipelines.common import stable_hash64

        keys = ["", "\x00", "\x00\x00", "a\x00b", "ab"]
        full = stable_hash64(pd.Series(keys, dtype=object))
        singles = np.concatenate(
            [stable_hash64(pd.Series([k], dtype=object)) for k in keys]
        )
        assert (full == singles).all()
        assert len(set(full.tolist())) == len(keys)

    @given(
        vals=st.lists(
            st.one_of(
                st.integers(min_value=-(2**62), max_value=2**62),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
            ),
            min_size=1,
            max_size=50,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_numeric_hash_stable_across_block_splits(self, vals):
        import pandas as pd

        from ethiomart_amharic_ner_ray.pipelines.common import stable_hash64

        s = pd.Series(vals)
        full = stable_hash64(s)
        cut = len(vals) // 2
        half = np.concatenate(
            [
                stable_hash64(s.iloc[:cut]) if cut else np.empty(0, np.uint64),
                stable_hash64(s.iloc[cut:]),
            ]
        )
        assert (full == half).all()

    @given(keys=st.lists(st.text(max_size=100), min_size=1, max_size=30))
    @settings(max_examples=60, deadline=None)
    def test_fast_and_slow_string_paths_agree(self, keys):
        """_hash_string_chunk has a padded-matrix fast path for batches whose
        longest string is <= 64 bytes and a streaming path above; a string's
        hash must not depend on which path its BATCH took (mixing a long
        string into a batch switches every member to the slow path)."""
        import pandas as pd

        from ethiomart_amharic_ner_ray.pipelines.common import stable_hash64

        mixed = stable_hash64(pd.Series(keys + ["x" * 100], dtype=object))[:-1]
        plain = stable_hash64(pd.Series(keys, dtype=object))
        assert (mixed == plain).all()

    def test_arrow_and_pandas_paths_agree(self):
        """add_bucket hashes Arrow tables directly; kg's stamper hashes a
        pandas frame. The same (string, int) rows must bucket identically
        through both entry points."""
        import pandas as pd
        import pyarrow as pa

        from ethiomart_amharic_ner_ray.pipelines.common import stable_hash64

        df = pd.DataFrame({"k": ["a", "", "\x00", "ብር"], "n": [1, 2, 3, 4]})
        t = pa.table({"k": df["k"], "n": df["n"]})
        assert (stable_hash64(df) == stable_hash64(t)).all()


class TestCanonPriceLaws:
    @given(
        v=st.decimals(
            min_value="0.01", max_value="99999999", places=2, allow_nan=False, allow_infinity=False
        )
    )
    @settings(max_examples=300, deadline=None)
    def test_comma_grouping_never_changes_the_value(self, v):
        """'1,234.56' and '1234.56' must canonicalize identically (the
        reference's comma-strip), and integral values collapse to ints."""
        from ethiomart_amharic_ner_ray.functions.canonical import canon_price, parse_price

        plain = f"{v:f}".rstrip("0").rstrip(".")
        intpart, _, frac = plain.partition(".")
        grouped = f"{int(intpart):,}" + (f".{frac}" if frac else "")
        assert canon_price(plain) == canon_price(grouped)
        assert parse_price(grouped) == float(plain)
        if float(plain) == int(float(plain)):
            assert canon_price(plain) == f"{int(float(plain))} ብር"

    @given(junk=st.text(max_size=12))
    @settings(max_examples=200, deadline=None)
    def test_garbage_never_raises(self, junk):
        from ethiomart_amharic_ner_ray.functions.canonical import canon_price, parse_price

        p = parse_price(junk)
        c = canon_price(junk)
        assert (p is None) == (c is None)

    def test_phone_national_form(self):
        from ethiomart_amharic_ner_ray.functions.canonical import canon_phone

        assert canon_phone("911234567") == "0911234567"
        assert canon_phone("0911234567") == "0911234567"


class TestExtractorSpanLaws:
    @given(text=mixed_text)
    @settings(max_examples=150, deadline=None)
    def test_spans_are_valid_and_sorted(self, text):
        """Every mention's span indexes clean_text, spans are ordered by
        start, and the non-LOC surface equals the span slice."""
        from ethiomart_amharic_ner_ray.functions.extract import (
            build_loc_pattern,
            extract_mentions,
        )
        from ethiomart_amharic_ner_ray.functions.textnorm import clean_text_v1

        clean = clean_text_v1(text)
        loc = build_loc_pattern()
        ms = extract_mentions(clean, loc)
        last = -1
        for m in ms:
            assert 0 <= m["start"] <= m["end"] <= len(clean)
            assert m["start"] >= last
            last = m["start"]
            if m["etype"] == "LOC":
                assert clean[m["start"] : m["end"]] == m["surface"]


class TestNulBytesEndToEnd:
    """NUL bytes in string GROUP KEYS cannot be grouped correctly by the
    pandas kernels (pandas' string hash table merges keys at the first NUL
    — 'a' and 'a\\x00' become one group, verified on pandas 2.2), and
    before stable_hash64 the exchange could additionally send the same
    NUL key to different buckets. The engine's contract: the exchange
    REFUSES NUL-bearing keys loudly (assert_nul_free_keys), and
    sanitize_nul_strings is the explicit opt-in fix. This tests both
    halves end-to-end."""

    def _data(self):
        import numpy as np
        import pyarrow as pa

        rng = np.random.RandomState(5)
        keys = ["", "\x00", "\x00\x00", "a", "a\x00", "a\x00b", "ab", "ብር\x00"]
        n = 20_000
        k = np.array(keys, dtype=object)[rng.randint(0, len(keys), n)]
        v = rng.rand(n)
        return keys, pa.table({"k": pa.array(list(k)), "v": pa.array(v)})

    def test_exchange_refuses_nul_keys(self, ray_session):
        import pandas as pd
        import pytest
        import ray.data as rd
        from ray.exceptions import RayTaskError

        from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg

        _, t = self._data()

        def agg(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("k", as_index=False).agg(n=("v", "size"))

        with pytest.raises((RayTaskError, ValueError), match="NUL"):
            bucketed_group_agg(rd.from_arrow(t).repartition(4), ["k"], agg, n_buckets=8).to_pandas()

    def test_sanitized_grouping_is_repartition_invariant(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.common import (
            bucketed_group_agg,
            sanitize_nul_strings,
        )

        keys, t = self._data()

        def agg(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("k", as_index=False).agg(n=("v", "size"), s=("v", "sum"))

        results = []
        for width in (1, 4, 13):
            ds = sanitize_nul_strings(rd.from_arrow(t).repartition(width), ["k"])
            out = (
                bucketed_group_agg(ds, ["k"], agg, n_buckets=8)
                .to_pandas()
                .groupby("k", as_index=False)
                .agg(n=("n", "sum"), s=("s", "sum"))
                .sort_values("k")
                .reset_index(drop=True)
            )
            results.append(out)
        base = results[0]
        # U+FFFD substitution keeps the 8 keys distinct (positional), and
        # every width agrees with the single-partition truth
        assert len(base) == len({k.replace("\x00", "�") for k in keys})
        for r in results[1:]:
            pd.testing.assert_frame_equal(r, base)


class TestWqInterpMatchesQuantileCont:
    """_wq_interp (the distinct-value-histogram quantile rule behind
    q145/q150/q166/kg_seller_response_p50) must equal DuckDB's
    quantile_cont on the expanded multiset for arbitrary histograms and
    quantiles — including ties, single-value histograms, and q landing
    exactly on a rank."""

    def test_random_histograms(self):
        import duckdb
        import numpy as np

        from ethiomart_amharic_ner_ray.pipelines.relational import _wq_interp

        rng = np.random.default_rng(11)
        con = duckdb.connect()
        for trial in range(25):
            n_vals = int(rng.integers(1, 12))
            vals = np.unique(rng.integers(-50, 500, n_vals)).astype(np.float64)
            counts = rng.integers(1, 6, len(vals)).astype(np.int64)
            expanded = np.repeat(vals, counts)
            for q in (0.0, 0.01, 0.25, 1.0 / 3, 0.5, 0.75, 0.9, 0.99, 1.0):
                got = _wq_interp(vals, counts, q)
                want = con.execute(
                    "SELECT quantile_cont(x, ?) FROM (SELECT unnest(?::DOUBLE[]) AS x)",
                    [q, list(expanded)],
                ).fetchone()[0]
                assert got == want, (trial, q, vals, counts, got, want)


class TestDiscQuantilesMatchDuckdb:
    """_disc_quantiles_from_hist (RFM/CLV/price-band thresholds) must pick
    the same multiset ELEMENT as DuckDB's quantile_disc for arbitrary
    histograms — the ceil(q*n) rank rule, including exact-rank landings
    and heavy ties."""

    def test_random_histograms(self):
        import duckdb
        import numpy as np

        from ethiomart_amharic_ner_ray.pipelines.relational import _disc_quantiles_from_hist

        rng = np.random.default_rng(13)
        con = duckdb.connect()
        for trial in range(25):
            n_vals = int(rng.integers(1, 10))
            vals = np.unique(rng.integers(-20, 200, n_vals)).astype(np.int64)
            counts = rng.integers(1, 7, len(vals)).astype(np.int64)
            expanded = np.repeat(vals, counts)
            qs = [0.01, 0.25, 1.0 / 3, 0.5, 2.0 / 3, 0.75, 0.99, 1.0]
            got = _disc_quantiles_from_hist(vals, counts, qs)
            for q, g in zip(qs, got):
                want = con.execute(
                    "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?::BIGINT[]) AS x)",
                    [q, [int(v) for v in expanded]],
                ).fetchone()[0]
                assert g == want, (trial, q, vals.tolist(), counts.tolist(), g, want)


class TestRoundAwayMatchesDuckdbRound:
    """round_away must equal DuckDB round() bitwise over random doubles at
    every digit count the query surface uses (2, 4, 6) — half-away-from-
    zero semantics including negative halves and values whose scaled form
    sits within an ulp of the .5 boundary."""

    def test_random_values(self):
        import duckdb
        import numpy as np

        from ethiomart_amharic_ner_ray.pipelines.common import round_away

        rng = np.random.default_rng(17)
        con = duckdb.connect()
        vals = np.concatenate(
            [
                rng.uniform(-1e6, 1e6, 200),
                rng.integers(-500, 500, 50).astype(np.float64) / 2.0,  # exact halves
                np.array([0.00005, -0.00005, 0.615, -0.615, 2.675, 1.0049999999]),
            ]
        )
        for d in (2, 4, 6):
            got = round_away(vals, d)
            want = np.array(
                con.execute(
                    f"SELECT list(round(x, {d}) ORDER BY rowid) FROM "
                    "(SELECT unnest(?::DOUBLE[]) AS x, "
                    "generate_subscripts(?::DOUBLE[], 1) AS rowid)",
                    [list(vals), list(vals)],
                ).fetchone()[0]
            )
            mism = np.nonzero(got != want)[0]
            assert len(mism) == 0, (d, vals[mism][:5], got[mism][:5], want[mism][:5])
