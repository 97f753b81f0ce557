"""Driver-mirror conformance: every SQL-checked queries() entry must match
its oracle_sql() DuckDB result at sf0.001 (column names, row count, values —
order-insensitive). This is the same comparison the grading driver runs at
sf0.01."""

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "uint32", "uint64", "UInt32", "Int64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


SQL_CHECKED = [
    "q01_pricing_summary",
    "q02_filter_orders",
    "q03_segment_revenue",
    "q04_region_rollup",
    "q05_topk_parts",
    "q06_events_daily",
    "q07_user_engagement",
    "q08_user_activity",
    "q09_user_value_stats",
    "q10_lending_score",
    "q11_dedup_exact",
    "q12_token_count",
    "q13_quality_score",
    "q14_lang_id",
    "q15_doc_fingerprint",
    "q16_knn_cosine",
    "q17_asof_last_signup",
    "q18_hourly_windows",
    "q19_event_type_counts",
    "q20_supplier_nation",
    "q21_sessionize",
    "q22_customers_without_orders",
    "q23_top_event_per_user_type",
    "q24_best_worst_day",
    "q25_embedding_neardup",
    "q26_bpe_token_estimate",
    "q27_range_join_count",
    "q28_sliding_windows",
    "q29_deterministic_sample",
    "q30_distinct_pairs",
    "q31_region_nation_rollup",
    "q32_event_type_pivot",
    "q33_top3_events_per_user",
    "knn_self_join",
    "ann_ivf_exact_topk",
    "q34_stratified_sample",
    "q35_vocab_topk",
    "q36_event_lag_stats",
    "q37_cumulative_spend",
    "q38_brand_price_rank",
    "q39_order_size_corr",
    "q40_brand_median_price",
    "q41_user_modal_event",
    "q42_weekly_active_users",
    "q43_bloom_semi_join",
    "q44_region_rollup_totals",
    "q45_json_props_stats",
    "q46_brand_type_concat",
    "q47_users_both_events",
    "q48_brand_price_quantiles",
    "q49_above_avg_orders",
    "q50_region_priority_grid",
    "q51_first_last_event",
    "q52_bigram_topk",
    "q53_tfidf_topk",
    "q54_decontaminate",
    "q55_value_histogram",
    "q56_customer_bigorder_stats",
    "q57_segment_lineitem_revenue",
    "q58_funnel_stages",
    "q59_cohort_retention",
    "q60_spend_deciles",
    "q61_weighted_sample",
    "q62_asof_join",
    "q63_token_repetition",
    "q64_order_count_histogram",
    "q65_weekly_change",
    "q66_quality_funnel",
    "q67_shared_shingles",
    "q68_doc_chunks",
    "q69_oov_rate",
    "q70_event_zscore",
    "q71_jaccard_pairs_exact",
    "q72_dedup_survivors",
    "q73_event_debounce",
    "q74_bigram_pmi",
    "q75_char_entropy",
    "q76_order_cube",
    "q77_moving_avg",
    "q78_lineitem_melt",
    "q79_event_type_share",
    "q80_unigram_logppl",
    "q81_copurchase_pairs",
    "q82_triangle_count",
    "q83_brand_mad_outliers",
    "q84_brand_price_regression",
    "q85_fuzzy_name_pairs",
    "q86_keyword_search",
    "q87_group_centroids",
    "q88_table_profile",
    "q89_daily_gapfill",
    "q90_embedding_covariance",
    "q91_interval_merge",
    "q92_snapshot_diff",
    "q93_referential_integrity",
    "q94_skyline",
    "q95_percent_rank",
    "q96_event_entropy",
    "q97_user_transitions",
    "q98_prev_rows_stats",
    "q99_khop_parts",
    "q100_equidepth_bins",
    "q101_bigram_logppl",
    "q102_benford_audit",
    "q103_time_weighted_avg",
    "q104_rolling_distinct_users",
    "q105_audience_overlap",
    "q106_purchase_attribution",
    "q107_daily_orders_vs_events",
    "q108_upsert_latest",
    "q109_scd2_intervals",
    "q110_user_value_ewma",
    "q111_chisq_independence",
    "q112_weighted_median",
    "q113_linear_interp",
    "q114_readability",
    "q115_longest_streak",
    "q116_session_conversion",
    "q117_autocorr_lag1",
    "q118_minmax_scale",
    "q119_seasonality_strength",
    "q120_distinct_user_rollup",
    "q121_dup_span_stats",
    "q122_order_ntile",
    "q123_event_grouping_sets",
    "q124_bm25_topk",
    "q127_hybrid_retrieval",
    "q128_token_fertility",
    "q129_temperature_mix",
    "q130_leakage_free_split",
    "q131_source_quality_gate",
    "q132_source_overlap",
    "q133_span_removal",
    "q134_padding_waste",
    "q135_dsir_logratio",
    "q136_gopher_repetition",
    "q137_zipf_alpha",
    "q138_ppl_buckets",
    "q139_boilerplate_ngrams",
    "q140_validation_report",
    "q141_global_median_exact",
    "q142_k_anonymity",
    "q143_fuzzy_decontaminate",
    "q144_gini_spend",
    "q145_iqr_outliers",
    "q146_dau_jaccard",
    "q147_time_to_convert",
    "q148_revenue_share",
    "q149_copurchase_degree_hist",
    "q150_winsorized_mean",
    "q151_ship_leadtime",
    "q152_daily_bounce_rate",
    "q153_new_vs_returning",
    "q154_rfm_segments",
    "q155_source_ks",
    "q156_frequent_triples",
    "q157_brand_discount_qty_corr",
    "q158_pair_lift",
    "q159_double_charge",
    "q160_abc_classes",
    "q161_hapax_ratio",
    "q162_supplier_hhi",
    "q163_conversion_ztest",
    "q174_cramers_v",
    "q175_prefix_families",
    "q176_return_rate_wilson",
    "q178_share_swing",
    "q183_hourly_load_p95",
    "q184_weekly_control_chart",
    "q185_quantity_discount_curve",
    "q186_leadtime_p90_matrix",
    "q187_theil_index",
    "q188_assoc_rules",
    "q189_user_burstiness",
    "q190_source_ttr",
    "q191_simpson_diversity",
    "q192_crosssource_dup_matrix",
    "q193_length_decile_bands",
    "q194_cluster_size_hist",
    "q195_anova_f",
    "q196_poisson_dispersion",
    "q197_embedding_norm_outliers",
    "q198_weekday_chi2",
    "q199_val_oov_rate",
    "q200_part_affinity_jaccard",
    "q201_event_hour_heatmap",
    "q202_lang_confusion_matrix",
    "q203_l_diversity",
    "q204_shingle_df_histogram",
    "q205_conditional_entropy",
    "q206_ngram_coverage_curve",
    "q207_hill_tail_index",
    "q208_heaps_exponent",
    "q209_price_ending_bias",
    "q210_monthly_supplier_hhi",
    "q211_discount_return_rate",
    "q179_segment_priority_residuals",
    "q180_clv_quartile_migration",
    "q181_source_lang_purity",
    "q182_prefix_family_diversity",
    "q164_cusum_changepoint",
    "q165_open_order_backlog",
    "q166_session_duration_quantiles",
    "q167_customer_order_gap_median",
    "q168_retention_curve",
    "q169_brand_price_bands",
    "q170_design_effect",
    "q171_nation_flow_matrix",
    "q172_new_vs_repeat_revenue",
    "q173_net_revenue_monthly",
    "q125_source_divergence",
    "q126_mixture_budget",
    "er_canonical_names",
    "keyword_index_search",
    "q212_price_digit_benford",
    "q213_token_length_hist",
    "q214_embedding_dim_audit",
    "q215_segment_value_cv",
    "q216_charclass_density",
    "q217_event_type_cooccurrence",
    "q218_stopword_ratio",
    "q219_brand_price_spread",
    "q220_monthly_return_share",
    "q221_orders_per_customer_hist",
    "q222_brand_discount_depth",
    "q223_weekday_hour_heatmap",
    "q224_value_share_by_type",
    "q225_priority_mix_by_month",
    "q226_user_lifespan_hist",
    "q227_nation_negative_acctbal",
    "q228_status_mix_by_year",
    "q229_type_catalog_profile",
    "q230_weighted_median",
]

# transcript-derived entries: their oracle SQL reads the cached sf0.01
# fixture by literal path (the driver's correctness scale), so the Ray side
# must run at sf0.01 here too
SQL_CHECKED_TX = [
    "kg_text_equality",
    "kg_turns_per_conv",
    "kg_turn_context",
    "kg_seller_turncounts",
    "kg_response_latency",
    "kg_conv_len_by_price",
    "kg_seller_response_p50",
    "kg_seller_price_cv",
    "kg_role_transitions",
    "kg_conv_funnel",
    "kg_loc_corridors",
    "kg_shared_phones",
    "kg_clean_text",
    "kg_price_redact",
    "kg_mention_flags",
    "kg_mention_flags_full",
    "kg_seller_price_stats",
    "kg_prices_exploded",
    "kg_price_trajectory",
    "kg_tool_assisted_pricing",
    "kg_locs_exploded",
    "kg_seller_loc_matrix",
    "kg_price_by_location",
    "kg_phones_exploded",
    "labeling_tag_distribution",
    "labeling_quality_report",
    "kg_turn_balance",
    "kg_tool_usage_share",
    "kg_price_stats_by_product_flag",
]


@pytest.mark.parametrize("name", SQL_CHECKED + SQL_CHECKED_TX)
def test_query_matches_oracle(name, entrymod, con):
    sf_dir = "/root/testdata/sf0.01" if name in SQL_CHECKED_TX else SF_DIR
    got = _canon(_to_pandas(entrymod.queries()[name](sf_dir)))
    want = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, atol=1e-9)


def test_every_query_has_oracle_or_is_flagged(entrymod):
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert set(SQL_CHECKED) | set(SQL_CHECKED_TX) == set(sqls)


def test_entry_smoke(entrymod):
    ds = entrymod.entry()
    n = ds.count()
    assert n > 0
    names = set(ds.schema().names)
    assert {"subj", "pred", "obj", "conv_id", "turn_idx", "provenance"} <= names


class TestSaltedAgg:
    def test_salted_equals_plain_under_zipf(self, ray_session):
        """salted_group_agg must give the same per-key result as a plain
        aggregation when one key holds 90% of rows (the hot-seller shape)."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.common import salted_group_agg

        rng = np.random.RandomState(3)
        n = 50_000
        keys = np.where(rng.rand(n) < 0.9, "hot", rng.choice([f"k{i}" for i in range(50)], n))
        vals = rng.rand(n)
        t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
        ds = rd.from_arrow(t).repartition(8)

        def partial(df):
            return df.groupby("k", as_index=False).agg(p_n=("v", "size"), p_sum=("v", "sum"))

        def combine(df):
            g = df.groupby("k", as_index=False).agg(n=("p_n", "sum"), s=("p_sum", "sum"))
            return g

        got = (
            salted_group_agg(ds, ["k"], partial, combine, n_salts=8)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        ref = (
            pd.DataFrame({"k": keys, "v": vals})
            .groupby("k", as_index=False)
            .agg(n=("v", "size"), s=("v", "sum"))
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got["k"].tolist() == ref["k"].tolist()
        assert got["n"].tolist() == ref["n"].tolist()
        assert np.allclose(got["s"], ref["s"])
        # the hot key really was split in round 1: >1 partial row for it
        # (indirect check: partial count per salt < total)
        assert ref.loc[ref["k"] == "hot", "n"].iloc[0] > 40_000


def test_q43_exact_under_bloom_false_positives(entrymod, con, ray_session):
    """Shrinking the Bloom filter to 256 bits makes nearly every probe a
    false positive; the bucketed recheck must still produce the exact
    semi-join result."""
    from ethiomart_amharic_ner_ray.pipelines.relational import q43_bloom_semi_join

    got = _canon(_to_pandas(q43_bloom_semi_join(SF_DIR, bloom_bits=256)))
    want = _canon(con.sql(entrymod.oracle_sql()["q43_bloom_semi_join"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, atol=1e-9)


def test_approx_audience_overlap_tracks_exact(entrymod, ray_session):
    """HLL inclusion-exclusion overlap estimates must track q105's exact
    matrix within the compounded sketch error at fixture cardinalities."""
    import pandas as pd

    exact = entrymod.queries()["q105_audience_overlap"](SF_DIR)
    if not isinstance(exact, pd.DataFrame):
        exact = exact.to_pandas()
    approx = entrymod.queries()["approx_audience_overlap"](SF_DIR)
    m = exact.merge(approx, on=["type_a", "type_b"])
    assert len(m) == len(exact)
    rel = (m["approx_overlap"] - m["n_users"]).abs() / m["n_users"].clip(lower=1)
    assert rel.max() < 0.15, m[rel > 0.15]


def test_q122_ntile_remainder_rule(ray_session, tmp_path):
    """The closed-form row_number→tile map must match SQL NTILE on the two
    edges the fixture's big partitions never hit: a partition SMALLER than k
    (every row its own tile) and one where N % k != 0 (the first N % k tiles
    take the extra row)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.relational import q122_order_ntile

    rng = np.random.default_rng(3)
    rows = []
    for prio, n in (("1-SMALL", 5), ("2-RAGGED", 13), ("3-EXACT", 16)):
        for i in range(n):
            rows.append((len(rows) + 1, prio, float(rng.integers(1, 1000))))
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "orders.parquet"))

    got = (
        q122_order_ntile(str(tmp_path), k=8)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(
        f"""SELECT o_orderkey,
                   CAST(ntile(8) OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS tile
            FROM '{tmp_path}/orders.parquet' ORDER BY o_orderkey"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mixture_budget_boundary_doc_across_batches(ray_session):
    """The per-batch prune must keep each batch's first over-budget doc:
    without it, a truly-rejected doc's mass vanishes from the final
    cumulative sums and docs past the cutoff get over-admitted. Planted
    case: in hash order a source has chars (6, 6, 3) against budget 10 —
    only the first doc is admitted (6+6 > 10 rejects the second, and the
    window cumsum 15 > 10 rejects the third even though 6+3 <= 10). The
    trigger layout puts the first two docs in ONE batch (so the second is
    pruned there) and the third in another — without the boundary row the
    pre-fix code admits the third doc (verified over-admitting)."""
    import hashlib

    import ray

    from ethiomart_amharic_ner_ray.pipelines.textstats import mixture_budget

    ids = list(range(1, 10))
    ids.sort(key=lambda i: hashlib.md5(str(i).encode("ascii")).hexdigest())
    adv = ids[:3]  # three ids in ascending hash order
    b1 = pd.DataFrame({"doc_id": adv[:2], "source": ["adv"] * 2, "n_chars": [6, 6]})
    b2 = pd.DataFrame(
        {
            "doc_id": [adv[2]] + ids[3:],
            "source": ["adv"] + ["fill"] * 6,
            "n_chars": [3] + [2] * 6,
        }
    )
    df = pd.concat([b1, b2], ignore_index=True)
    got = (
        mixture_budget(ray.data.from_pandas([b1, b2]), budget_chars=10, batch_size=2)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )

    # pandas window-cumsum oracle (the q126 SQL semantics)
    h = [hashlib.md5(str(i).encode("ascii")).hexdigest() for i in df["doc_id"]]
    d = df.assign(_h=h).sort_values(["source", "_h", "doc_id"], kind="mergesort")
    c = d.groupby("source")["n_chars"].cumsum()
    want = (
        d[c <= 10][["source", "doc_id", "n_chars"]]
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    assert want[want["source"] == "adv"]["doc_id"].tolist() == [adv[0]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q136_gopher_planted_repetition(ray_session, tmp_path):
    """Hand-checkable Gopher-gate cases the fixture's word soup can't pin:
    a doc whose repeated 5-gram spans OVERLAP (position-union must not
    double-count the shared tokens), a short all-distinct doc (Gopher's
    literal 'most frequently-occurring n-gram' includes singletons, so a
    SHORT clean doc still trips the top-3-gram rule — the rule is meant
    for long web docs), and a long all-distinct doc that passes.
    Doc A = 'a b c d e a b c d e a' (11 tokens, 11 chars): the 5-gram
    'a b c d e' occurs at positions 0 and 5, plus 'b c d e a' at 1 and 6
    etc. — every position is covered, dup5_frac = 1.0; top 3-gram 'a b c'
    occurs 2x covering 6 of 11 chars. Doc B (6 distinct tokens): top
    singleton 3-gram is 'two three four'+1 chars = 13 of 22. Doc C (30
    distinct 3-char tokens): top3_frac = 9/90 = 0.1 <= 0.18, keep = 1."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.textstats import q136_gopher_repetition

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a b c d e a b c d e a",
                "one two three four five six",
                " ".join(f"t{i:02d}" for i in range(30)),
            ],
            "lang": ["en", "en", "en"],
            "source": ["src0", "src0", "src0"],
            "n_chars": [21, 27, 119],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), str(tmp_path / "documents.parquet")
    )
    got = (
        q136_gopher_repetition(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    a = got.iloc[0]
    assert a["n_tok"] == 11 and a["total_chars"] == 11
    # top 3-gram by count*chars: any of the 2x 3-grams covers 2*3=6 chars
    assert a["top3_frac"] == round(6 / 11, 4)
    assert a["dup5_frac"] == 1.0 and a["keep"] == 0
    b = got.iloc[1]
    # singleton top 3-gram by chars: 'three four five' = 5+4+4 = 13 of 22
    assert b["top3_frac"] == round(13 / 22, 4)
    assert b["dup5_frac"] == 0.0 and b["keep"] == 0
    c = got.iloc[2]
    assert c["n_tok"] == 30 and c["total_chars"] == 90
    assert c["top3_frac"] == 0.1 and c["dup5_frac"] == 0.0 and c["keep"] == 1


class TestGlobalMedianSelection:
    """q141's distributed-selection internals: multi-round refinement,
    odd/even n, and all-equal degenerate input."""

    def test_multi_round_refinement_matches(self, entrymod, ray_session, con):
        from ethiomart_amharic_ner_ray.pipelines import relational

        # n_bins=2 + tiny tail_cap forces several narrowing rounds
        got = relational.q141_global_median_exact(SF_DIR, n_bins=2, tail_cap=64)
        want = con.sql(entrymod.oracle_sql()["q141_global_median_exact"]).df()
        pd.testing.assert_frame_equal(
            _canon(got), _canon(want), check_dtype=False, atol=1e-9
        )

    def test_odd_and_constant_inputs(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ethiomart_amharic_ner_ray.pipelines import relational

        # odd n: exact middle element, no interpolation
        v = np.array([5.0, 1.0, 9.0, 7.0, 3.0])
        pq.write_table(pa.table({"l_extendedprice": v}), str(tmp_path / "lineitem.parquet"))
        got = relational.q141_global_median_exact(str(tmp_path), n_bins=4, tail_cap=2)
        assert got["median"].iloc[0] == 5.0 and got["n"].iloc[0] == 5

        # all-equal values: the degenerate lo == hi loop exit
        pq.write_table(
            pa.table({"l_extendedprice": np.full(100, 42.5)}),
            str(tmp_path / "lineitem.parquet"),
        )
        got = relational.q141_global_median_exact(str(tmp_path), n_bins=4, tail_cap=8)
        assert got["median"].iloc[0] == 42.5 and got["n"].iloc[0] == 100


def test_q145_planted_outliers(ray_session, tmp_path):
    """The fixture's o_totalprice never crosses a Tukey fence (n_outliers=0
    everywhere), so plant a heavy-tailed group and a clean group and check
    the fence math (interpolated quantiles from the distinct-value
    histogram + epsilon compare) against DuckDB's quantile_cont on raw rows,
    including repeated values that make the histogram collapse counts."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.relational import q145_iqr_outliers

    rng = np.random.default_rng(7)
    tail = np.concatenate(
        [rng.integers(100, 120, 200).astype(float),  # tight body, many ties
         np.array([500.0, 750.0, 1000.0, 1000.0])]   # planted outliers incl. a tie
    )
    clean = rng.integers(100, 200, 150).astype(float)
    df = pd.DataFrame(
        {
            "o_orderpriority": ["1-TAIL"] * len(tail) + ["2-CLEAN"] * len(clean),
            "o_totalprice": np.concatenate([tail, clean]),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), str(tmp_path / "orders.parquet")
    )

    got = (
        q145_iqr_outliers(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(
        f"""WITH f AS (
                SELECT o_orderpriority,
                       quantile_cont(o_totalprice, 0.25) AS q1,
                       quantile_cont(o_totalprice, 0.75) AS q3
                FROM '{tmp_path}/orders.parquet' GROUP BY 1)
            SELECT o.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1) + 1e-6
                                   OR o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1) - 1e-6
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM '{tmp_path}/orders.parquet' o JOIN f USING (o_orderpriority)
            GROUP BY 1 ORDER BY 1"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.loc[got["o_orderpriority"] == "1-TAIL", "n_outliers"].iloc[0] >= 4


def test_q159_planted_double_charges(ray_session, tmp_path):
    """The fixture has no same-value same-user events within 60s, so plant
    a duplicate burst (3 equal charges in 90s — chain adjacency), an
    exact-timestamp twin, a same-value pair OUTSIDE the window, and a
    same-value pair across DIFFERENT users, and check the neighbor-check
    engine against the EXISTS-self-join oracle."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.windows import q159_double_charge

    t0 = pd.Timestamp("2025-06-01 10:00:00")
    rows = [
        # chain: e1-e2 30s apart, e2-e3 50s apart (e1-e3 80s: still flagged via e2)
        (1, 100, 9.99, t0),
        (2, 100, 9.99, t0 + pd.Timedelta(seconds=30)),
        (3, 100, 9.99, t0 + pd.Timedelta(seconds=80)),
        # exact-timestamp twin
        (4, 200, 5.00, t0),
        (5, 200, 5.00, t0),
        # same value, outside the window
        (6, 300, 7.77, t0),
        (7, 300, 7.77, t0 + pd.Timedelta(seconds=61)),
        # same value within window but DIFFERENT users
        (8, 400, 3.33, t0),
        (9, 401, 3.33, t0 + pd.Timedelta(seconds=5)),
        # clean singleton
        (10, 500, 1.23, t0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "value", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    got = (
        q159_double_charge(str(tmp_path))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    import __ray_entry__ as m

    want = con.sql(m.oracle_sql()["q159_double_charge"]).df().sort_values("day").reset_index(drop=True)
    got["day"] = got["day"].astype("datetime64[us]")
    want["day"] = want["day"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert int(got["n_flagged"].sum()) == 5  # e1,e2,e3 + the twin pair


def test_q158_planted_many_parts_per_order(ray_session, tmp_path):
    """Scale-shape regression for the round-3 weak finding: the marginal
    pass must survive orders with MANY distinct parts (the pair-expansion
    hot case) and duplicate (order, part) rows, with the per-bucket
    partial counts summing to the exact DISTINCT-pair marginals. Plants a
    60-part hot order (1770 pairs from one order), overlapping mid-size
    orders that create lift above/below 1, duplicated lineitem rows, and
    single-part orders that only move the marginals."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.relational import q158_pair_lift

    rows = []
    # hot order: 60 distinct parts, every row duplicated 3x
    for p in range(1, 61):
        rows += [(1000, p)] * 3
    # overlapping pairs across several orders -> n_ab >= 2 support
    for ok in range(2000, 2010):
        rows += [(ok, 1), (ok, 2)]           # strong co-occurrence
    for ok in range(3000, 3006):
        rows += [(ok, 3), (ok, 70 + (ok % 3))]  # weaker, spread
    # single-part orders: inflate marginals (lower lift) without pairs
    for ok in range(4000, 4030):
        rows.append((ok, 1))
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "lineitem.parquet"),
    )

    got = q158_pair_lift(str(tmp_path)).reset_index(drop=True)
    con = duckdb.connect()
    want = con.sql(
        f"""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM '{tmp_path}/lineitem.parquet'),
            tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM lp),
            marg AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_a
                     FROM lp GROUP BY 1),
            pairs AS (
                SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                       CAST(count(*) AS BIGINT) AS n_ab
                FROM lp a JOIN lp b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2 HAVING count(*) >= 2)
            SELECT p.part_a, p.part_b, p.n_ab,
                   round((CAST(p.n_ab AS DOUBLE) * t.n)
                         / (CAST(ma.n_a AS DOUBLE) * mb.n_a), 6) AS lift
            FROM pairs p
            JOIN marg ma ON ma.l_partkey = p.part_a
            JOIN marg mb ON mb.l_partkey = p.part_b
            CROSS JOIN tot t
            ORDER BY lift DESC, p.part_a, p.part_b LIMIT 50"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planted strong pair must outrank the hot order's incidental pairs
    top = got.iloc[0]
    assert (int(top["part_a"]), int(top["part_b"])) == (1, 2) or top["lift"] > 1


def test_q180_no_year2_revenue(ray_session, tmp_path):
    """ADVICE round-3: when no customer has year-2 revenue the y2 quantile
    set is empty — the engine must emit the all-churned column (q_year2=0)
    instead of raising on an empty histogram, matching the oracle's NULL
    thresholds."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.relational import q180_clv_quartile_migration

    df = pd.DataFrame(
        {
            "o_custkey": [1, 1, 2, 3, 4],
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-06-01", "2024-02-01", "2024-03-01", "2024-04-01"]
            ),
            "o_totalprice": [100.0, 50.0, 200.0, 300.0, 400.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "orders.parquet"))
    out = q180_clv_quartile_migration(str(tmp_path))
    assert (out["q_year2"] == 0).all()
    assert int(out["n_customers"].sum()) == 4


def test_q189_planted_metronome_and_burst(ray_session, tmp_path):
    """Burstiness edge semantics: a metronome user (equal positive gaps,
    sigma=0) must land at exactly -1, a bursty user above 0, a single-gap
    user is excluded (needs >=2 gaps), and an all-zero-gap user (exact
    duplicate timestamps) fails the positive-denominator filter on BOTH
    sides."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.windows import q189_user_burstiness

    t0 = pd.Timestamp("2025-01-01")
    rows = []
    # metronome: 5 events, 60s apart
    rows += [(i, 1, t0 + pd.Timedelta(seconds=60 * i)) for i in range(5)]
    # bursty: 3 tight then a huge gap
    rows += [(10, 2, t0), (11, 2, t0 + pd.Timedelta(seconds=1)),
             (12, 2, t0 + pd.Timedelta(seconds=2)), (13, 2, t0 + pd.Timedelta(hours=10))]
    # single gap: excluded
    rows += [(20, 3, t0), (21, 3, t0 + pd.Timedelta(seconds=30))]
    # all-identical timestamps: zero mean+std, excluded
    rows += [(30, 4, t0), (31, 4, t0), (32, 4, t0)]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    got = (
        q189_user_burstiness(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(got["user_id"]) == [1, 2]
    assert got.loc[got["user_id"] == 1, "burstiness"].iloc[0] == -1.0
    assert got.loc[got["user_id"] == 2, "burstiness"].iloc[0] > 0
    con = duckdb.connect()
    want = con.sql(
        f"""SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
                   round((stddev_pop(gap) - avg(gap))
                         / (stddev_pop(gap) + avg(gap)), 6) AS burstiness
            FROM (SELECT user_id,
                         date_diff('microsecond',
                                   lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id),
                                   ts) / 1e6 AS gap
                  FROM '{tmp_path}/events.parquet')
            GROUP BY user_id
            HAVING count(gap) >= 2 AND stddev_pop(gap) + avg(gap) > 0
            ORDER BY user_id"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q197_planted_norm_outliers(ray_session, tmp_path):
    """Norm-band semantics: a zero vector (norm 0 <= mean/4) and a 10x
    vector (norm > 4*mean) are both flagged; the uniform bulk is not."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.similarity import q197_embedding_norm_outliers

    rng = np.random.default_rng(3)
    # 300 bulk vectors keep the mean representative; the 5x vector is a
    # 25x norm-squared outlier without dominating the mean itself
    bulk = rng.normal(0, 0.1, (300, 32)).astype("float32")
    vecs = list(bulk) + [np.zeros(32, dtype="float32"), (bulk[0] * 5).astype("float32")]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = q197_embedding_norm_outliers(str(tmp_path))
    assert int(out["n_vecs"].iloc[0]) == 302
    assert int(out["n_outliers"].iloc[0]) == 2
    assert out["max_ratio"].iloc[0] > 4


def _oracle_on(entrymod, name, view_sql: dict):
    """Run an oracle_sql() entry against ad-hoc views (degenerate-input
    parity checks)."""
    c = duckdb.connect()
    for view, src in view_sql.items():
        c.sql(f"CREATE VIEW {view} AS SELECT * FROM '{src}'")
    return c.sql(entrymod.oracle_sql()[name]).df()


def test_q197_degenerate_inputs_match_oracle(ray_session, entrymod, tmp_path):
    """r5 (ADVICE): empty embeddings table and all-zero vectors must not
    raise — both sides emit the same typed row (NULL→NaN under the
    driver's NaN-equal compare; DuckDB's // truncation makes every
    zero-norm vector an outlier in the all-zero case)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.similarity import q197_embedding_norm_outliers

    schema = pa.schema([("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))])
    for case, vecs in (
        ("empty", []),
        ("zeros", [np.zeros(8, dtype="float32")] * 5),
    ):
        d = tmp_path / case
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(len(vecs)), pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                },
                schema=schema,
            ),
            str(d / "embeddings.parquet"),
        )
        got = _canon(q197_embedding_norm_outliers(str(d)))
        want = _canon(
            _oracle_on(
                entrymod,
                "q197_embedding_norm_outliers",
                {"embeddings": str(d / "embeddings.parquet")},
            )
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # spot-check the pinned semantics
    assert int(got["n_outliers"].iloc[0]) == 5  # zeros case: all flagged
    assert pd.isna(got["max_ratio"].iloc[0])


def test_q208_degenerate_single_source_matches_oracle(ray_session, entrymod, tmp_path):
    """r5 (ADVICE): one source (or all-equal token counts) zeroes the OLS
    denominator — both sides emit NaN/NULL beta and ln_k, no numpy
    warning, no inf."""
    import warnings

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.textstats import q208_heaps_exponent

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "source": pa.array(["web", "web"], pa.string()),
                "text": pa.array(["a b c", "a b d e"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    with warnings.catch_warnings():
        # numpy's invalid-divide RuntimeWarning must not fire on the guard
        warnings.simplefilter("error", RuntimeWarning)
        got = _canon(q208_heaps_exponent(str(tmp_path)))
    want = _canon(
        _oracle_on(
            entrymod,
            "q208_heaps_exponent",
            {"documents": str(tmp_path / "documents.parquet")},
        )
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert int(got["n_sources"].iloc[0]) == 1
    assert pd.isna(got["beta"].iloc[0]) and pd.isna(got["ln_k"].iloc[0])


def test_kg_exploded_checkpoint_staleness_guard(ray_session, tmp_path, monkeypatch):
    """The shared exploded-mention checkpoint must REBUILD when the
    transcripts regenerate (different content => different file sizes)
    and REUSE byte-stable when they do not."""
    import os
    import time

    import __ray_entry__ as m

    sf = "/root/testdata/sf0.001"
    d1 = m._kg_exploded_checkpoint(sf)
    files1 = sorted(os.listdir(d1))
    t1 = [os.path.getmtime(os.path.join(d1, f)) for f in files1]
    time.sleep(0.05)
    # same inputs: reuse without rewrite
    d2 = m._kg_exploded_checkpoint(sf)
    assert d2 == d1
    assert [os.path.getmtime(os.path.join(d1, f)) for f in sorted(os.listdir(d1))] == t1
    # stale stamp (simulates a regenerated corpus changing the signature):
    # rewrite the marker with a wrong signature and expect a rebuild
    import json

    marker = os.path.join(d1, "_DONE.json")
    json.dump({"sig": "stale"}, open(marker, "w"))
    d3 = m._kg_exploded_checkpoint(sf)
    assert d3 == d1
    assert json.load(open(marker))["sig"] != "stale"  # rebuilt and restamped


def test_content_signature_same_size_same_mtime(tmp_path):
    """r5 hardening (VERDICT task 1): the checkpoint signature is a CONTENT
    fingerprint — a regenerated input whose files keep byte-identical sizes
    AND restored mtimes still invalidates (the footer-tail hash sees the
    changed bytes). Also: file set changes and empty dirs are distinct."""
    import os

    from ethiomart_amharic_ner_ray.state.manifest import content_signature

    d = tmp_path / "in"
    d.mkdir()
    f = d / "part-0.parquet"
    f.write_bytes(b"A" * 4096)
    st = f.stat()
    s1 = content_signature(d)
    assert content_signature(d) == s1  # deterministic
    # same size, different content, mtime forced back to the original
    f.write_bytes(b"A" * 2048 + b"B" + b"A" * 2047)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert f.stat().st_size == st.st_size
    assert f.stat().st_mtime_ns == st.st_mtime_ns
    assert content_signature(d) != s1
    # a tail-only change in a file larger than the hashed window still lands
    # in the window (the change is in the footer region)
    big = d / "part-1.parquet"
    big.write_bytes(b"C" * (1 << 17))
    s2 = content_signature(d)
    body = bytearray(big.read_bytes())
    body[-10] = ord("D")
    stb = big.stat()
    big.write_bytes(bytes(body))
    os.utime(big, ns=(stb.st_atime_ns, stb.st_mtime_ns))
    assert content_signature(d) != s2
    # file-set changes invalidate; empty dir is its own value
    big.unlink()
    s3 = content_signature(d)
    assert s3 not in (s1, s2)
    f.unlink()
    assert content_signature(d) not in (s1, s2, s3)


def test_kg_exploded_checkpoint_content_keyed(ray_session, tmp_path, monkeypatch):
    """End-to-end: pointing the driver at a DIFFERENT corpus (new content,
    fresh dir) yields a different checkpoint key — stale mentions can never
    be served across corpus regenerations."""
    import os
    import shutil

    import __ray_entry__ as m

    sf = "/root/testdata/sf0.001"
    real = m.transcripts_dir_for(sf)
    d1 = m._kg_exploded_checkpoint(sf)
    # copy the corpus and perturb one file's mtime (regeneration marker)
    alt = tmp_path / "tx"
    shutil.copytree(real, alt)
    first = sorted(alt.glob("*.parquet"))[0]
    os.utime(first, ns=(0, 0))
    monkeypatch.setattr(m, "transcripts_dir_for", lambda _sf: str(alt))
    d2 = m._kg_exploded_checkpoint(sf)
    assert d2 != d1  # new signature => new checkpoint directory
    assert os.path.exists(os.path.join(d2, "_DONE.json"))


def test_q230_weighted_median_property(ray_session, tmp_path):
    """r5: the distributed weighted-median selection must match the
    sequential definition (smallest v with 2·cumweight(≤v) ≥ W) on random
    weighted data — including duplicate values and skewed weights, and
    regardless of tail_cap forcing multiple refinement rounds."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines.relational import q230_weighted_median

    rng = np.random.default_rng(11)
    n = 5000
    # duplicate-heavy values, skewed integer weights
    v = np.round(rng.lognormal(4, 1, n), 2)
    v[: n // 10] = v[0]  # a heavy duplicate block
    q = rng.integers(1, 51, n).astype("int64")
    q[:5] = 10_000  # weight skew
    tbl = pa.table(
        {
            "l_orderkey": pa.array(np.arange(n), pa.int64()),
            "l_extendedprice": pa.array(v, pa.float64()),
            "l_quantity": pa.array(q.astype("float64"), pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))

    order = np.argsort(v, kind="mergesort")
    cw = np.cumsum(q[order])
    W = int(q.sum())
    expect = float(v[order][int(np.argmax(2 * cw >= W))])

    for tail_cap in (65536, 16):  # 16 forces several refinement rounds
        out = q230_weighted_median(str(tmp_path), tail_cap=tail_cap)
        assert int(out["total_weight"].iloc[0]) == W
        assert float(out["weighted_median"].iloc[0]) == expect, tail_cap
