"""Full-text search: derived inverted index + MATCH-expression compiler.

The reference uses SQLite FTS5 virtual tables (``nodefts``/``edgefts``,
/root/reference/graphydb.py:638-658) and joins them on uid with a ``MATCH``
predicate (graphydb.py:876-893).  Here the index is a *derived* DataFrame
``(uid, field, token)`` built with JVM-side built-ins (lower + regex split +
posexplode — no Python UDF in the hot path), and a MATCH expression compiles
to semi-join set algebra on uids.

Tokenizer parity: FTS5's default ``unicode61`` splits on non-alphanumeric
codepoints and lowercases.  We mirror that with ``[^\\p{L}\\p{N}]+`` —
diacritic folding is NOT applied (documented divergence, SURVEY.md §7.4).

Supported MATCH syntax (the subset the reference exercises,
tests/test_graphdb.py:107-110 + graphydb.py:855):

* ``term``            — token equality (case-insensitive)
* ``term*``           — token prefix
* ``field: term``     — restrict to one indexed field
* ``a b``             — implicit AND (uid must match every term)
* ``a OR b``          — union
* ``NOT a``           — difference (applied after positive terms)

At scale the index is just another DataFrame: partition it by token for
point lookups, or leave it co-partitioned with the base table for rebuilds;
matches are semi-joins that AQE can broadcast when the term is selective.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"[^\p{L}\p{N}]+"


def tokens_col(col):
    """Array-of-tokens column (JVM-side, codegen-friendly)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != "")


def _field_col(df: DataFrame, f_name: str):
    """Property accessor: typed pstruct field when the frame has one
    (columnar, no JSON parse), else a JSON path extract."""
    if "pstruct" in df.columns:
        fields = {f.name for f in df.schema["pstruct"].dataType.fields}
        if f_name in fields:
            return F.col("pstruct").getField(f_name).cast("string")
    return F.get_json_object(F.col("props"), f"$.{f_name}")


def build_index(df: DataFrame, fields: list[str]) -> DataFrame:
    """``(uid, field, token)`` inverted index over JSON property fields.

    ``field`` values are property names inside the ``props`` JSON document
    (the reference indexes chosen columns of the item's data,
    graphydb.py:638-658).
    """
    parts = []
    for f_name in fields:
        src = _field_col(df, f_name)
        parts.append(
            df.select(
                F.col("uid"),
                F.lit(f_name).alias("field"),
                F.posexplode(tokens_col(src)).alias("pos", "token"),
            ).where(F.col("token").isNotNull())
            .select("uid", "field", "token", "pos")
        )
    if not parts:
        # empty index with the right schema
        return df.sparkSession.createDataFrame(
            [], "uid string, field string, token string, pos int")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # NOT deduplicated: boolean matching distincts per term anyway
    # (match path), so a global dedup here would only add a full shuffle
    # of the token stream.  Use build_tf_index for frequency-aware use.
    return out


def build_tf_index(df: DataFrame, fields: list[str]) -> DataFrame:
    """``(uid, field, token, tf, doc_len)`` — the ranked-search index
    (keeps term frequencies; :func:`build_index` is the boolean-match
    form).  One narrow explode + one groupBy per field."""
    parts = []
    for f_name in fields:
        src = _field_col(df, f_name)
        toks = df.select(F.col("uid"), F.lit(f_name).alias("field"),
                         F.explode(tokens_col(src)).alias("token"))
        tf = (toks.groupBy("uid", "field", "token")
                  .agg(F.count("*").alias("tf")))
        dlen = (toks.groupBy("uid", "field")
                    .agg(F.count("*").alias("doc_len")))
        parts.append(tf.join(dlen, ["uid", "field"]))
    if not parts:
        return df.sparkSession.createDataFrame(
            [], "uid string, field string, token string, tf long, "
                "doc_len long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bm25_scores(tf_index: DataFrame, terms: list[str], k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """BM25 ranking over the tf index → (uid, score), descending-worthy.

    The F5 surface the reference only exposes as a raw FTS5 table
    reference (graphydb.py:895-898) — here it is a first-class ranked
    retrieval operator.  All aggregation is distributed; N/avgdl/df are
    computed as one tiny aggregate + broadcast join.
    """
    terms = [t.lower() for t in terms]
    docs = tf_index.select("uid", "doc_len").dropDuplicates(["uid"])
    stats = docs.agg(F.count("*").alias("n_docs"),
                     F.avg("doc_len").alias("avgdl")).collect()[0]
    n_docs, avgdl = stats["n_docs"], stats["avgdl"] or 1.0
    hits = tf_index.where(F.col("token").isin(terms))
    dfreq = (hits.groupBy("token")
             .agg(F.countDistinct("uid").alias("df")))
    scored = (hits.join(F.broadcast(dfreq), "token")
              .withColumn("idf", F.log(
                  (F.lit(float(n_docs)) - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0))
              .withColumn("w", F.col("idf") * (F.col("tf") * (k1 + 1)) /
                          (F.col("tf") + k1 * (1 - b + b * F.col("doc_len")
                                               / F.lit(float(avgdl))))))
    return scored.groupBy("uid").agg(F.sum("w").alias("score"))


_TERM_RE = re.compile(r'(?:([\w]+)\s*:\s*)?([\w]+)(\*)?', re.UNICODE)


_PHRASE_RE = re.compile(r'(?:([\w]+)\s*:\s*)?"([^"]*)"', re.UNICODE)


def parse_match(query: str) -> list[tuple[str, list[tuple]]]:
    """Parse a MATCH expression into OR-groups of (negated, field, term,
    prefix) tuples; terms inside a group are ANDed.  FTS5-style quoted
    phrases (``"exact words"``, optionally field-qualified) parse into a
    term that is a TUPLE of tokens — matched by adjacent positions."""
    groups: list[list[tuple]] = [[]]
    # pull quoted phrases out before whitespace-splitting
    phrases: list[tuple] = []

    def keep(m: re.Match) -> str:
        toks = tuple(t for t in re.split(r"[^\w]+", m.group(2).lower()) if t)
        phrases.append((m.group(1), toks))
        return f" \x00{len(phrases) - 1}\x00 "

    query = _PHRASE_RE.sub(keep, query)
    tokens = query.replace("(", " ").replace(")", " ").split()
    negate_next = False
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        up = tok.upper()
        if up == "OR":
            groups.append([])
            i += 1
            continue
        if up == "AND":
            i += 1
            continue
        if up == "NOT":
            negate_next = True
            i += 1
            continue
        if tok.startswith("\x00") and tok.endswith("\x00"):
            field, toks = phrases[int(tok.strip("\x00"))]
            if toks:
                groups[-1].append((negate_next, field, toks, False))
            negate_next = False
            i += 1
            continue
        # field-qualified term may come as 'field:' 'term' or 'field:term'
        if tok.endswith(":") and i + 1 < len(tokens):
            tok = tok + tokens[i + 1]
            i += 1
        m = _TERM_RE.fullmatch(tok)
        if m:
            field, term, star = m.group(1), m.group(2), m.group(3)
            groups[-1].append((negate_next, field, term.lower(), bool(star)))
            negate_next = False
        i += 1
    return [("OR", g) for g in groups if g]


def _term_uids(index: DataFrame, field, term, prefix) -> DataFrame:
    if isinstance(term, tuple):
        return _phrase_uids(index, field, term)
    cond = F.col("token").startswith(term) if prefix else F.col("token") == term
    if field:
        cond = cond & (F.col("field") == field)
    return index.where(cond).select("uid").distinct()


def _phrase_uids(index: DataFrame, field, terms: tuple) -> DataFrame:
    """uids containing the tokens at ADJACENT positions (FTS5 phrase).

    Anchor on the first token's (uid, field, pos) and semi-join each
    subsequent token at pos+i — per-term postings are small after the
    token filter, so the joins stay narrow."""
    def postings(term, alias_pos):
        cond = F.col("token") == term
        if field:
            cond = cond & (F.col("field") == field)
        return index.where(cond).select(
            "uid", F.col("field").alias("f"),
            F.col("pos").alias(alias_pos))
    acc = postings(terms[0], "p0")
    for i, term in enumerate(terms[1:], start=1):
        nxt = postings(term, "pn") \
            .withColumn("p0", F.col("pn") - i).drop("pn")
        acc = acc.join(nxt, ["uid", "f", "p0"], "left_semi")
    return acc.select("uid").distinct()


def match_uids(index: DataFrame, query: str) -> DataFrame:
    """Compile a MATCH expression to a DataFrame of matching uids."""
    or_parts = []
    for _, group in parse_match(query):
        pos = [t for t in group if not t[0]]
        neg = [t for t in group if t[0]]
        if pos:
            acc = _term_uids(index, *pos[0][1:])
            for t in pos[1:]:
                acc = acc.join(_term_uids(index, *t[1:]), "uid", "left_semi")
        else:
            acc = index.select("uid").distinct()
        for t in neg:
            acc = acc.join(_term_uids(index, *t[1:]), "uid", "left_anti")
        or_parts.append(acc)
    if not or_parts:
        return index.select("uid").limit(0)
    out = or_parts[0]
    for p in or_parts[1:]:
        out = out.unionByName(p)
    return out.distinct()
