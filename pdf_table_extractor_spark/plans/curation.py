"""The composed training-data curation pass: one gate-verified plan that
takes a corpus of documents and emits, per document, everything a filtering
stage needs — exact-dup rank, MinHash near-dup candidacy, language guess,
quality score, Gopher repetition/shape filters, PII counts, and the final
keep decision.

Shuffle budget (100 TB framing):
- one projection computes every scalar feature (md5, lang, quality, PII
  counts) in a single pass over the text — no repeated scans;
- exact dedup = one window over hash(text_md5) (rank within duplicate
  group, deterministic keeper = lowest id);
- Gopher's unigram mode = explode + two partially-aggregated groupBys
  (shuffle carries (doc, token) partial counts);
- MinHash/LSH candidacy = the dedup module's banded self-join, flagged
  back onto documents via a left-semi-shaped join on id.
The id-keyed joins co-partition after the first exchange; everything else
is expression-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import dedup, sampling, textquality, training


def curate_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 4,
    band_size: int = 1,
) -> DataFrame:
    """df(id, text, ...) → one curation row per document:

    (id, text_md5, dup_rank, is_exact_dup, near_dup_candidate, lang_guess,
     quality_score, passes_gopher, n_pii, keep)

    ``keep`` = canonical copy (dup_rank 1) AND passes the Gopher filters.
    Flags are ints (not booleans) so external SQL oracles hash identically.
    """
    text = F.col(text_col)
    scalar = df.select(
        F.col(id_col),
        F.md5(text).alias("text_md5"),
        textquality.lang_guess_expr(dedup.tokens(text)).alias("lang_guess"),
        F.round(textquality.quality_score_expr(text), 6).alias("quality_score"),
        (
            F.regexp_count(text, F.lit(textquality.PII_EMAIL))
            + F.regexp_count(text, F.lit(textquality.PII_IPV4))
            + F.regexp_count(text, F.lit(textquality.PII_PHONE))
        ).alias("n_pii"),
    )
    w = Window.partitionBy("text_md5").orderBy(id_col)
    scalar = scalar.withColumn("dup_rank", F.row_number().over(w)).withColumn(
        "is_exact_dup", (F.col("dup_rank") > 1).cast("int")
    )

    gopher = textquality.gopher_quality(df, text_col=text_col, id_col=id_col).select(
        id_col, F.col("passes_gopher").cast("int").alias("passes_gopher")
    )

    sig = dedup.minhash_signatures(
        df, text_col=text_col, id_col=id_col, n_hashes=n_hashes
    )
    pairs = dedup.lsh_candidates(sig, id_col=id_col, n_hashes=n_hashes, band_size=band_size)
    cand = (
        pairs.select(F.col("a").alias(id_col))
        .unionByName(pairs.select(F.col("b").alias(id_col)))
        .distinct()
        .withColumn("near_dup_candidate", F.lit(1))
    )

    out = (
        scalar.join(gopher, id_col, "left")
        .join(cand, id_col, "left")
        .withColumn("near_dup_candidate", F.coalesce("near_dup_candidate", F.lit(0)))
        .withColumn("passes_gopher", F.coalesce("passes_gopher", F.lit(0)))
    )
    return out.withColumn(
        "keep",
        ((F.col("dup_rank") == 1) & (F.col("passes_gopher") == 1)).cast("int"),
    ).select(
        id_col,
        "text_md5",
        "dup_rank",
        "is_exact_dup",
        "near_dup_candidate",
        "lang_guess",
        "quality_score",
        "passes_gopher",
        "n_pii",
        "keep",
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[dict],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str = "n_bpe_tokens",
) -> DataFrame:
    """docs + ``count_col``: per-document token count at trained-BPE
    granularity — the tokenizer-true denomination for every downstream
    token budget (sharding, packing, mixing). Whitespace word counts
    over- or under-state a document's training cost by whatever the
    tokenizer's fertility is; budgets denominated here match what the
    training loader will actually consume.

    ``training.bpe_encode_counts`` drops documents whose tokenization is
    empty (its vocabulary join is inner); this wrapper left-joins the
    counts back so EVERY input row survives with an explicit 0 — a
    sharding prefix-sum must see all docs or downstream offsets shift.

    Scale: the merge chain runs over the VOCABULARY once; the corpus
    pays one tokenize + one broadcast join + one per-doc aggregate.
    """
    counts = training.bpe_encode_counts(
        docs, merges, id_col=id_col, text_col=text_col
    ).select(F.col(id_col), F.col("n_subwords"))
    return (
        docs.join(counts, id_col, "left")
        .withColumn(count_col, F.coalesce("n_subwords", F.lit(0)).cast("long"))
        .drop("n_subwords")
    )


def shard_by_bpe_tokens(
    docs: DataFrame,
    *,
    tokens_per_shard: int,
    merges: list[dict] | None = None,
    bpe_k: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_size: int = 1 << 20,
) -> DataFrame:
    """Token-budgeted contiguous sharding denominated in trained-BPE
    tokens (the default token source for a training-data export): train
    the merges in-corpus when not supplied, count per-doc subwords via
    one broadcast vocabulary join, then run ``sampling.assign_shards``'s
    two-level prefix sum on those counts. Output: docs columns +
    ``n_bpe_tokens`` + ``token_offset`` + ``shard``."""
    if merges is None:
        merges = training.bpe_merges(docs, bpe_k, text_col=text_col)
    with_n = bpe_token_counts(docs, merges, id_col=id_col, text_col=text_col)
    return sampling.assign_shards(
        with_n,
        tokens_per_shard=tokens_per_shard,
        n_tokens=F.col("n_bpe_tokens"),
        order_col=id_col,
        group_size=group_size,
    )


def pack_by_bpe_tokens(
    docs: DataFrame,
    *,
    seq_len: int,
    merges: list[dict] | None = None,
    bpe_k: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_size: int = 1 << 20,
) -> DataFrame:
    """``sampling.pack_sequences`` with segment lengths denominated in
    trained-BPE tokens — the packing manifest counts what the training
    loader will actually emit per document, not whitespace words."""
    if merges is None:
        merges = training.bpe_merges(docs, bpe_k, text_col=text_col)
    with_n = bpe_token_counts(docs, merges, id_col=id_col, text_col=text_col)
    return sampling.pack_sequences(
        with_n,
        seq_len=seq_len,
        n_tokens=F.col("n_bpe_tokens"),
        order_col=id_col,
        group_size=group_size,
    )


def mix_plan_bpe(
    docs: DataFrame,
    *,
    target_tokens: int,
    weights: dict[str, float],
    merges: list[dict] | None = None,
    bpe_k: int = 6,
    slice_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``sampling.mix_plan`` whose per-slice stats are summed trained-BPE
    token counts: the mixture targets and repeat factors are stated in
    the same unit the training run consumes. One corpus tokenize + one
    broadcast vocab join + one per-slice aggregate (tiny stats table)."""
    if merges is None:
        merges = training.bpe_merges(docs, bpe_k, text_col=text_col)
    with_n = bpe_token_counts(docs, merges, id_col=id_col, text_col=text_col)
    stats = with_n.groupBy(F.col(slice_col).alias("slice")).agg(
        F.sum("n_bpe_tokens").alias("n_tokens")
    )
    return sampling.mix_plan(
        stats, target_tokens=target_tokens, weights=weights
    )
