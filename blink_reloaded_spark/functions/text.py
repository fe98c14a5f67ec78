"""Text functions as pure Column expressions (JVM-side, whole-stage codegen).

Each function documents its exact arithmetic so the DuckDB oracle in
``__spark_entry__.py`` can mirror it 1:1. The reference's analogues:
lowercasing at every ingest (`blink/main_dense.py:85-92` "LOWERCASE
EVERYTHING!"), whitespace tokenize / re-join (`examples/zeshel/
create_BLINK_zeshel_data.py:113-128`), text truncation
(`blink/biencoder/zeshel_utils.py:59`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for the rolling fingerprint: 2^31 - 1 keeps (acc*31 + 255) inside
# int64 in every engine.
FNV_MOD = 2_147_483_647

# Tiny per-language stopword marker sets for the n-gram/stopword language-ID
# heuristic. Deterministic toy lists — the point is the operator shape
# (argmax of per-language evidence), not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "a", "of", "and", "to", "is"],
    "es": ["el", "la", "los", "que", "y", "es"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3"],
}

# Stopwords for the quality score (English-ish, matches the synthetic corpus
# vocabulary which embeds "the"/"a").
QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "is", "in", "it"]


def normalize_text(c: Column) -> Column:
    """lower(trim(collapse whitespace)). Reference: P1 lowercase projection."""
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def tokens(c: Column, normalize: bool = True) -> Column:
    """Split normalized text on non-alphanumeric runs; drop empties.

    DuckDB mirror: list_filter(string_split_regex(<norm>, '[^a-z0-9]+'),
    t -> t != ''). normalize=False skips the inner normalize_text for
    callers that already projected the normalized string (idempotent, so
    values are identical either way).
    """
    s = normalize_text(c) if normalize else c
    return F.filter(F.split(s, "[^a-z0-9]+"), lambda t: t != F.lit(""))


def char_shingles(
    c: Column, k: int = 5, distinct: bool = True, normalize: bool = True
) -> Column:
    """k-char shingles of the normalized string (whole string if shorter).

    Built with sequence+transform so it stays in codegen. DuckDB mirror uses
    list_transform(generate_series(...)..., i -> substr(s, i, k)).

    PERF: expressions inside a transform() lambda are evaluated PER ELEMENT —
    with normalize=True the regexp_replace in normalize_text runs once per
    shingle, i.e. O(|text|) regex passes per row. Hot paths should project
    the normalized text once and call with normalize=False (normalize_text
    is idempotent, so the values are identical either way).
    """
    s = normalize_text(c) if normalize else c
    n = F.greatest(F.length(s) - F.lit(k - 1), F.lit(1))
    sh = F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(s, i, F.lit(k)))
    return F.array_distinct(sh) if distinct else sh


def token_shingles(c: Column, n: int = 3, distinct: bool = True) -> Column:
    """n-token shingles (space-joined) — the J8/BM25 blocking analogue
    (`blink/candidate_generation.py:68-115` scores token overlap)."""
    t = tokens(c)
    cnt = F.greatest(F.size(t) - F.lit(n - 1), F.lit(1))
    sh = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    return F.array_distinct(sh) if distinct else sh


def word_count(c: Column) -> Column:
    """Whitespace-ish token count (size of `tokens`)."""
    return F.size(tokens(c)).cast("long")


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-ish token count: alpha runs + digit runs + single other non-space.

    DuckDB mirror: len(regexp_extract_all(<norm>, pattern)).
    """
    return F.regexp_count(normalize_text(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]")).cast(
        "long"
    )


def rolling_fingerprint(c: Column) -> Column:
    """Polynomial rolling hash over characters: acc = (acc*31 + ascii(ch)) % (2^31-1).

    Deterministic, engine-portable document fingerprint. DuckDB mirror:
    list_reduce(list_prepend(0::BIGINT, list_transform(regexp_extract_all(s,
    '[\\s\\S]'), ch -> ascii(ch)::BIGINT)), (a, b) -> (a*31 + b) % 2147483647).
    """
    s = normalize_text(c)
    codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(FNV_MOD),
    )


def budget_context(
    left: Column, right: Column, mention: Column, max_tokens: int = 32
) -> Column:
    """Quota-balanced context window (F3, the reference's distinctive
    tokenizer windowing: `blink/biencoder/data_process.py:26-69` /
    `data_process2.py:35-101`): a token budget of `max_tokens` minus the
    mention is split evenly between left and right context; unused quota on
    the shorter side is redistributed to the longer side. Returns the
    windowed text 'left_window <mention> right_window'.

    Pure Column arithmetic: token arrays + slice — no UDF.
    """
    lt, rt, mt = tokens(left), tokens(right), tokens(mention)
    budget = F.greatest(F.lit(max_tokens) - F.size(mt), F.lit(0))
    half = (budget / 2).cast("int")
    l_avail, r_avail = F.size(lt), F.size(rt)
    # extra quota freed by the shorter side (data_process2 left/right_extra)
    l_take = F.least(l_avail, half + F.greatest(half - r_avail, F.lit(0)))
    r_take = F.least(r_avail, budget - l_take)
    l_win = F.slice(lt, F.greatest(l_avail - l_take + 1, F.lit(1)), F.greatest(l_take, F.lit(1)))
    l_txt = F.when(l_take > 0, F.array_join(l_win, " ")).otherwise(F.lit(""))
    r_txt = F.when(r_take > 0, F.array_join(F.slice(rt, 1, F.greatest(r_take, F.lit(1))), " ")).otherwise(F.lit(""))
    return F.trim(
        F.concat_ws(" ", l_txt, F.concat(F.lit("<"), normalize_text(mention), F.lit(">")), r_txt)
    )


def quality_score_cols(
    c: Column | None, s: Column | None = None, toks: Column | None = None
) -> dict[str, Column]:
    """Document-quality feature columns: lengths, punctuation ratio, stopword
    ratio, mean token length. All exact rational arithmetic over counts.

    Pass pre-projected `s` (normalized text) and `toks` columns on hot
    paths: each returned column otherwise embeds its own copy of the
    normalize/tokenize subtree, and Catalyst will not rewrite the shared
    work out of six sibling expressions."""
    s = normalize_text(c) if s is None else s
    toks = tokens(c) if toks is None else toks
    n_tok = F.size(toks)
    stop = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_chars = F.length(s)
    n_punct = F.regexp_count(s, F.lit(r"[^a-z0-9 ]"))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6),
        "avg_token_len": F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            / F.greatest(n_tok, F.lit(1)),
            6,
        ),
    }


def lang_id_col(c: Column | None, toks: Column | None = None) -> Column:
    """Language-ID heuristic: argmax over per-language stopword hit counts,
    ties broken by language code order; 'und' when no evidence.

    Pass a pre-projected `toks` column on hot paths: the argmax expression
    references each per-language count twice (in `best` and in its own
    when-branch), so an inline tokenize subtree is evaluated ~3x languages
    times per row."""
    toks = tokens(c) if toks is None else toks
    scores = {
        lang: F.size(
            F.filter(
                toks,
                lambda t: F.array_contains(F.array(*[F.lit(w) for w in ws]), t),
            )
        )
        for lang, ws in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reverse order so earlier languages win ties via later when() override
    for lang in sorted(scores, reverse=True):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr
