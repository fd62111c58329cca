"""NLP transforms: text→index sequence expansions and TF-IDF.

Reference parity:
- TextToCharacterIndexTransform
  (datavec-api/.../transform/nlp/TextToCharacterIndexTransform.java:39):
  each text value in a sequence expands to one row per character, carrying
  the character's integer index; other columns are duplicated; unknown
  characters are skipped (or raise, with exceptionOnUnknown).
- TextToTermIndexSequenceTransform
  (datavec-api/.../transform/nlp/TextToTermIndexSequenceTransform.java:45):
  same, per delimiter-split term.
- TfidfVectorizer
  (datavec-data-nlp/.../vectorizer/TfidfVectorizer.java:38, formulas in
  datavec-api/.../util/MathUtils.java:263-286 via DefaultVocabCache.java:111):
  tf = 1 + log10(count), idf = log10(N / docfreq), tfidf = tf * idf.

Spark-first design: the expansions are posexplode over split arrays — a
narrow per-row expansion, no shuffle at all; TF-IDF is two aggregations
(term counts per doc; doc frequency per term) joined back with the
document-frequency side BROADCAST (a vocabulary is small relative to the
corpus), so at 100 TB the only wide exchange is the groupBy on
(doc, term) — partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datavec_spark.functions.text import tokens
from datavec_spark.operators.transforms import op


def _index_map_expr(index_map: dict[str, int]):
    return F.map_from_arrays(
        F.array(*[F.lit(k) for k in index_map]),
        F.array(*[F.lit(v) for v in index_map.values()]),
    )


def _expand_to_index(
    df: DataFrame, column: str, new_column: str, pieces,
    index_map: dict[str, int], on_unknown: str, pos_col: str,
) -> DataFrame:
    m = _index_map_expr(index_map)
    others = [c for c in df.columns if c != column]
    out = df.select(*others, F.posexplode(pieces).alias(pos_col, "_piece"))
    idx = F.element_at(m, F.col("_piece"))
    if on_unknown == "fail":  # exceptionOnUnknown=true
        idx = F.when(
            idx.isNull(),
            F.raise_error(F.concat(F.lit("unknown token: "), F.col("_piece"))),
        ).otherwise(idx)
        out = out.withColumn(new_column, idx.cast("int"))
    else:  # skip unknown pieces (reference default path)
        out = out.withColumn(new_column, idx.cast("int")).where(F.col(new_column).isNotNull())
    return out.drop("_piece")


@op("text_to_char_index")  # TextToCharacterIndexTransform.java:39
def _text_to_char_index(df, column, new_column, char_index_map, on_unknown="skip",
                        pos_col="_exp_idx"):
    """Row → one row per character, `new_column` = char's integer index,
    `pos_col` = position within the original value (the expanded sequence
    order — combine with the original order column for the full ordering).
    """
    chars = F.split(F.col(column), "")
    return _expand_to_index(df, column, new_column, chars, char_index_map,
                            on_unknown, pos_col)


@op("text_to_term_index")  # TextToTermIndexSequenceTransform.java:45
def _text_to_term_index(df, column, new_column, word_index_map, delimiter=" ",
                        on_unknown="skip", pos_col="_exp_idx"):
    # delimiter is a regex, matching the reference's String.split(delimiter)
    terms = F.split(F.col(column), delimiter)
    return _expand_to_index(df, column, new_column, terms, word_index_map,
                            on_unknown, pos_col)


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def term_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                lowercase: bool = True) -> DataFrame:
    """(id, term, tf_count): whitespace tokens exploded and counted per doc.
    One shuffle, map-side partial agg."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return (
        df.select(F.col(id_col), F.explode(tokens(t)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf_count"))
    )


def tfidf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
          min_df: int = 1, lowercase: bool = True) -> DataFrame:
    """(id, term, tf, idf, tfidf) with the reference's formulas
    (MathUtils.java:263-286): tf = 1 + log10(count), idf = log10(N/df),
    tfidf = tf * idf. Terms below min_df documents are dropped
    (AbstractTfidfVectorizer minWordFrequency semantics).

    The doc-frequency table is one row per distinct term — broadcast to
    the (doc, term) side so the join is shuffle-free."""
    n_docs = df.count()
    tc = term_counts(df, text_col, id_col, lowercase)
    docfreq = (
        tc.groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .where(F.col("doc_freq") >= min_df)
    )
    idf = F.log10(F.lit(float(n_docs)) / F.col("doc_freq"))
    tf = F.lit(1.0) + F.log10(F.col("tf_count"))
    return (
        tc.join(F.broadcast(docfreq), "term")
        .select(
            F.col(id_col), F.col("term"),
            tf.alias("tf"),
            idf.alias("idf"),
            (tf * idf).alias("tfidf"),
        )
    )


def tfidf_vectors(df: DataFrame, vocab: list[str], text_col: str = "text",
                  id_col: str = "doc_id", lowercase: bool = True) -> DataFrame:
    """(id, tfidf_vec array<double> over a fixed vocabulary) — the
    TfidfVectorizer.createVector shape (TfidfVectorizer.java:40-48):
    vector[i] = tfidf(vocab[i]) for this doc, 0.0 where absent."""
    scored = tfidf(df, text_col, id_col, lowercase=lowercase)
    in_vocab = scored.where(F.col("term").isin(*vocab))
    as_map = in_vocab.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("term", "tfidf"))).alias("_m")
    )
    vec = F.array(*[
        F.coalesce(F.element_at(F.col("_m"), F.lit(v)), F.lit(0.0)) for v in vocab
    ])
    return (
        df.select(id_col).join(as_map, id_col, "left")
        .select(F.col(id_col), vec.alias("tfidf_vec"))
    )
