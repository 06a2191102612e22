#!/usr/bin/env python3
"""Oracle result-type lint (the r8 HUGEINT lesson, institutionalized).

DuckDB silently widens `sum(BIGINT)` and `//`-on-HUGEINT to HUGEINT
(int128). The driver's DuckDB hashes INT128 result columns differently
from older local versions, so a locally-bit-exact oracle can still
hash-FAIL the round gate (r8: 15 queries, all with >=1 HUGEINT output
column; 0 of the 184 green queries had one — perfect separation).
Exact local value comparison CANNOT catch this class; only a type check
can. So: DESCRIBE every oracle and reject any HUGEINT output column
outright, and flag DOUBLE output columns not on the allowlist (floats
on the contract are reserved for transcendental-derived values where an
exact scaled-integer form does not exist — see tools/README.md).

Usage: tools/lint_oracle_types.py <sfDir> <oracle_sql.json> [query ...]
Exit 1 on any HUGEINT (or un-allowlisted DOUBLE) output column.
"""
import sys, json, glob, os
import duckdb

# DOUBLE output columns that are allowed on the contract. Two ways in:
# (a) driver-verified portable — every (query, column) below marked
#     [r08-green] was hash-exact against the driver's DuckDB in
#     CORRECTNESS_r08, which is the strongest portability evidence
#     available (identical IEEE expression trees on both engines, no
#     round()-on-double ties); or
# (b) a justified new entry: transcendental-derived (ln/sqrt/exp folds)
#     where no exact scaled-integer form exists — add a comment.
# A NEW query's DOUBLE output column fails the lint until it earns an
# entry; prefer exact scaled integers wherever the math allows.
DOUBLE_ALLOWLIST = {
    # [r08-green] — all driver-hash-exact in CORRECTNESS_r08:
    ("c02_keep_latest", "value"),
    ("c03_envelope_roundtrip", "value"),
    ("c06_message_filter", "value"),
    ("c07_merge_lww", "value"),
    ("p07_serializer_projection", "o_totalprice"),
    ("p17_batch_distribution", "delay_s"),
    ("p17_dense_batches", "delay_s"),
    ("p22_latency_agg", "avg_lat"),
    ("q01_pricing_summary", "sum_qty"),
    ("q01_pricing_summary", "sum_base_price"),
    ("q01_pricing_summary", "sum_disc_price"),
    ("q01_pricing_summary", "avg_qty"),
    ("q02_filter_pushdown", "revenue"),
    ("q03_join_agg", "total"),
    ("q04_multi_join", "revenue"),
    ("q05_window_topn", "o_totalprice"),
    ("q06_rollup", "sum_qty"),
    ("q08_sort_limit", "l_extendedprice"),
    ("q18_grouping_sets", "total"),
    ("q19_correlated_sub", "total"),
    ("q20_lateral_topk", "total"),
    ("q21_ranking_windows", "pr"),
    ("q21_ranking_windows", "cd"),
    ("q22_unpivot", "val"),
    ("q23_recursive_calendar", "revenue"),
    ("q24_trailing_window", "trailing7"),
    ("q25_tpch_q3", "revenue"),
    ("q26_tpch_q5", "revenue"),
    ("q27_salted_join", "total"),
    ("q29_locf_fill", "last_purchase_val"),
    ("x04_dedup_ngram_jaccard", "jac"),
    ("x05_ann_cosine_topk", "sim"),
    ("x06_ann_lsh", "sim"),
    ("x07_text_quality", "avg_token_len"),
    ("x07_text_quality", "stopword_ratio"),
    ("x100_asof_states", "total_value"),
    ("x110_cdc_minimize", "net_value"),
    ("x116_conversion_lag", "lag_p50_us"),
    ("x116_conversion_lag", "lag_p90_us"),
    ("x118_twostage_retrieval", "sim"),
    ("x119_dim_quant_audit", "max_abs_err"),
    ("x120_ab_readout", "purchase_value"),
    ("x123_daily_anomaly", "v"),
    ("x123_daily_anomaly", "med"),
    ("x123_daily_anomaly", "mad"),
    ("x126_last_touch_attribution", "revenue"),
    ("x136_backlog_aging", "value_at_risk"),
    ("x17_embedding_neardup", "sim"),
    ("x18_embedding_neardup_lsh", "sim"),
    ("x19_token_quantiles", "q25"),
    ("x19_token_quantiles", "q50"),
    ("x19_token_quantiles", "q75"),
    ("x20_oov_ratio", "oov_ratio"),
    ("x21_decontamination", "contamination"),
    ("x22_repetition", "distinct_token_ratio"),
    ("x22_repetition", "dup_2gram_ratio"),
    ("x22_repetition", "dup_3gram_ratio"),
    ("x26_boilerplate", "boiler_ratio"),
    ("x27_curation_funnel", "share"),
    ("x28_char_entropy", "char_entropy"),
    ("x30_length_band", "lo"),
    ("x30_length_band", "hi"),
    ("x31_lm_score", "cross_entropy"),
    ("x32_chunk_dedup", "dup_ratio"),
    ("x33_quality_deciles", "score"),
    ("x34_dedup_containment", "containment"),
    ("x38_embedding_outliers", "sim_centroid"),
    ("x39_tfidf_keywords", "score"),
    ("x40_quantization_audit", "fidelity"),
    ("x43_bm25_search", "score"),
    # x151: same token-order-pinned 4dp-rounded BM25 fold as x43, over
    # the post-delete corpus
    ("x151_bm25_index_delete", "score"),
    ("x47_dsir_selection", "log_w"),
    ("x50_hard_negatives", "sim"),
    ("x52_temperature_mix", "mix_w"),
    ("x54_dup_gram_spans", "dup_ratio"),
    ("x55_props_extract", "avg_value"),
    ("x63_domain_shift_kl", "kl"),
    ("x70_distribution_drift", "ks"),
    ("x89_mad_outliers", "med"),
    ("x89_mad_outliers", "mad"),
    ("x91_hashed_linear_score", "score"),
    ("x96_range_partition_plan", "min_v"),
    ("x96_range_partition_plan", "max_v"),
}

# Output-type WHITELIST (stronger than a HUGEINT blacklist): the full
# declared surface emits only these today, and each is hash-stable
# across DuckDB versions (fixed-width integers, 32-bit DATE, raw
# VARCHAR, IEEE DOUBLE). Anything else — HUGEINT/DECIMAL (int128-backed,
# the r8 failure class), FLOAT (engine-divergent), TIMESTAMP (compare as
# epoch-µs instead), nested LIST/STRUCT/MAP/BLOB — fails the lint until
# it earns a justified entry here.
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT",
              "BOOLEAN", "DATE", "VARCHAR", "DOUBLE"}


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    n_bad = 0
    for q, sql in sorted(oracle.items()):
        if only and q not in only:
            continue
        # Spark-naive artifact oracles (read_parquet of a Spark-written
        # reference dump) are same-engine compares: both sides carry
        # identical parquet types, so no cross-DuckDB-version type
        # portability is in play. Only builder-authored SQL is linted.
        if sql.strip().upper().startswith("SELECT * FROM READ_PARQUET("):
            continue
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"LINT-ERR  {q}: describe failed: {e}")
            n_bad += 1
            continue
        for cname, ctype, *_ in cols:
            t = ctype.upper()
            if t not in SAFE_TYPES:
                hint = ("wrap the expression in CAST(... AS BIGINT)"
                        if "HUGEINT" in t or t.startswith("DECIMAL")
                        else "not on the hash-stable type whitelist")
                print(f"BAD-TYPE  {q}.{cname}: {ctype} — {hint}")
                n_bad += 1
            elif t == "DOUBLE" and (q, cname) not in DOUBLE_ALLOWLIST:
                print(f"DOUBLE    {q}.{cname}: not allowlisted — emit an "
                      f"exact scaled integer, or add a justified "
                      f"allowlist entry")
                n_bad += 1
    print(f"== lint: {n_bad} bad output column(s) ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
